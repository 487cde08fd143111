"""deepvariant_tpu.parallel"""
