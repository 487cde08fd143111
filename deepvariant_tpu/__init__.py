"""deepvariant_tpu: a TPU-native (JAX/XLA/Pallas) variant-calling framework.

A from-scratch re-design of the capabilities of google/deepvariant for TPU:

- ``io``: genomics I/O substrate (BGZF/BAM/FASTA/VCF/TFRecord) — the "nucleus"
  equivalent, with columnar (structure-of-arrays) read batches instead of
  per-read protos so the hot path vectorizes.
- ``make_examples``: candidate generation — allele counting, the
  very-sensitive caller, pileup-tensor encoding (host numpy reference +
  batched JAX/Pallas device encoder).
- ``realign``: local-assembly realignment (window selection, De Bruijn
  assembly, fast k-mer pass + striped Smith-Waterman).
- ``models``: Inception-v3-class CNN in flax plus the small-model MLP.
- ``calling``: batched, sharded inference (the call_variants stage).
- ``postprocess``: genotype resolution, multiallelic merge, haplotype conflict
  resolution, VCF/gVCF emission.
- ``training``: optax train loop with EMA, warmup+exponential decay,
  per-class weighted metrics, data-parallel ``shard_map``.
- ``parallel``: mesh construction and SPMD helpers.

Reference behavior is documented against google/deepvariant v1.10 file:line
citations throughout (see SURVEY.md)."""

__version__ = "0.1.0"
