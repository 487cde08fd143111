"""Per-product make_examples presets.

Since v1.10 the reference stores calling flags inside each released
model's `model.example_info.json` (`flags_for_calling`; see
deepvariant/json/deepvariant.pacbio.savedmodel/model.example_info.json
and run_deepvariant.py:484-493). These presets reproduce those
configurations per model type.

Channel enums (deepvariant.proto:1287-1342): 1-6 the base six,
7 haplotype_tag, 19 insert_size, 26 mean_coverage, 9/10 the
diff_channels alt-aligned planes (appended by the encoder).
"""

from __future__ import annotations

from typing import Optional

from deepvariant_tpu.make_examples.core import MakeExamplesOptions


def apply_model_preset(
    options: MakeExamplesOptions, model_type: str
) -> MakeExamplesOptions:
    """Mutates `options` with the model type's calling flags."""
    model_type = model_type.upper()
    p = options.pileup_options
    if model_type == "WGS":
        # WGS default: 6 base channels + insert_size.
        p.channels = (1, 2, 3, 4, 5, 6, 19)
    elif model_type == "WES":
        p.channels = (1, 2, 3, 4, 5, 6, 19)
    elif model_type in ("PACBIO", "MASSEQ"):
        # deepvariant.pacbio model.example_info.json flags_for_calling.
        p.channels = (1, 2, 3, 4, 5, 6, 7, 26)
        p.alt_aligned_pileup = "diff_channels"
        p.width = 147
        p.height = 100
        p.sort_by_haplotypes = True
        options.sort_by_haplotypes = True
        options.phase_reads = True
        options.track_ref_reads = True
        options.realigner_enabled = False
        options.max_reads_per_partition = 600
        options.min_mapping_quality = 1
        options.partition_size = 25000
        options.variant_caller_options.min_fraction_indels = 0.12
    elif model_type == "ONT_R104":
        p.channels = (1, 2, 3, 4, 5, 6, 7, 26)
        p.alt_aligned_pileup = "diff_channels"
        p.width = 147
        p.height = 100
        p.sort_by_haplotypes = True
        options.sort_by_haplotypes = True
        options.phase_reads = True
        options.track_ref_reads = True
        options.realigner_enabled = False
        options.max_reads_per_partition = 600
        options.min_mapping_quality = 5
        options.partition_size = 25000
        options.variant_caller_options.min_fraction_indels = 0.12
        options.variant_caller_options.min_fraction_snps = 0.08
    elif model_type == "HYBRID_PACBIO_ILLUMINA":
        p.channels = (1, 2, 3, 4, 5, 6, 19)
    elif model_type == "RNASEQ":
        # RNA-seq case study (docs/deepvariant-rnaseq-case-study.md:
        # 230-236): channels='' resets to the base six, and
        # split_skip_reads=true splits spliced (N-CIGAR) alignments
        # into per-exon reads before realignment
        # (realigner.py:230,824).
        p.channels = (1, 2, 3, 4, 5, 6)
        options.realigner_options.split_skip_reads = True
    else:
        raise ValueError(f"unknown model type: {model_type}")
    return options
