"""deepvariant_tpu.labeler"""
