"""deepvariant_tpu.scripts"""
