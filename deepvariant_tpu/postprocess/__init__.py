"""deepvariant_tpu.postprocess"""
