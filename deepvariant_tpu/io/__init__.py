"""deepvariant_tpu.io"""
