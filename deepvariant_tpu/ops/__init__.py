"""deepvariant_tpu.ops"""
