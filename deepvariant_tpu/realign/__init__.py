"""deepvariant_tpu.realign"""
