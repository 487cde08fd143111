"""deepvariant_tpu.small_model"""
