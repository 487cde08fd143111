"""deepvariant_tpu.calling"""
