"""deepvariant_tpu.tools"""
