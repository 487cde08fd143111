"""deepvariant_tpu.make_examples"""
