"""deepvariant_tpu.models"""
