"""deepvariant_tpu.core"""
