"""deepvariant_tpu.phasing"""
