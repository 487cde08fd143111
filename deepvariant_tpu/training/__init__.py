"""deepvariant_tpu.training"""
