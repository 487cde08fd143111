"""Assemble pileup tf.Examples for candidates (ExamplesGenerator parity).

Mirrors make_examples_native.cc: AltAlleleCombinations (:191-268),
GetReferenceBasesForPileup (:516-540, N-padding at contig edges),
CreateAndWriteExamplesForCandidate (:632-720, read-overlap window selection),
EncodeExample feature schema (:388-470).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from deepvariant_tpu.core.types import Range, Variant
from deepvariant_tpu.io import examples as example_codec
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.make_examples.pileup import (
    PileupEncoder,
    PileupOptions,
    reads_overlapping_variant,
)
from deepvariant_tpu.make_examples.variant_caller import DeepVariantCall

# EncodedVariantType (make_examples_native.cc:301-320).
VARIANT_TYPE_UNKNOWN = 0
VARIANT_TYPE_SNP = 1
VARIANT_TYPE_INDEL = 2


def encoded_variant_type(variant: Variant) -> int:
    if len(variant.reference_bases) == 1 and variant.alternate_bases:
        if all(len(a) == 1 for a in variant.alternate_bases):
            return VARIANT_TYPE_SNP
    if len(variant.reference_bases) > 1:
        return VARIANT_TYPE_INDEL
    if any(len(a) > 1 for a in variant.alternate_bases):
        return VARIANT_TYPE_INDEL
    return VARIANT_TYPE_UNKNOWN


def alt_allele_combinations(
    variant: Variant, multi_allelic_mode: str = "add_het_alt"
) -> List[List[str]]:
    """ADD_HET_ALT_IMAGES: every 1- and 2-subset of alts
    (make_examples_native.cc:207-227)."""
    alts = list(variant.alternate_bases)
    if multi_allelic_mode == "no_het_alt":
        return [[a] for a in alts]
    with_ref = [variant.reference_bases] + alts
    out = []
    for i in range(len(with_ref)):
        for j in range(i + 1, len(with_ref)):
            combo = []
            if i > 0:
                combo.append(with_ref[i])
            combo.append(with_ref[j])
            out.append(combo)
    return out


@dataclasses.dataclass
class BuiltExample:
    encoded: bytes
    variant: Variant
    alt_indices: List[int]
    image: np.ndarray
    label: Optional[int] = None


class ExamplesBuilder:
    """Builds tf.Examples for the candidates of one region."""

    def __init__(
        self,
        ref_reader,
        pileup_options: Optional[PileupOptions] = None,
        sequencing_type: int = 0,
    ):
        self.ref = ref_reader
        self.pileup_options = pileup_options or PileupOptions()
        self.encoder = PileupEncoder(self.pileup_options)
        self.sequencing_type = sequencing_type

    def reference_window(self, variant: Variant) -> Optional[np.ndarray]:
        """Pileup-width ref bases centered at variant.start, N-padded at
        contig edges (GetReferenceBasesForPileup)."""
        o = self.pileup_options
        start = variant.start - o.half_width
        end = start + o.width
        n_bases = self.ref.contig_length(variant.reference_name)
        lo = max(0, start)
        hi = min(n_bases, end)
        if lo >= hi:
            return None
        bases = self.ref.bases(Range(variant.reference_name, lo, hi))
        if start < 0 or end > n_bases:
            out = np.full(o.width, ord("N"), np.uint8)
            out[lo - start : lo - start + len(bases)] = bases
            return out
        return bases

    def build_examples_for_candidate(
        self,
        dv_call: DeepVariantCall,
        batch: ReadBatch,
        label_fn=None,
    ) -> Iterator[BuiltExample]:
        variant = dv_call.variant
        ref_window = self.reference_window(variant)
        if ref_window is None or len(ref_window) != self.pileup_options.width:
            return
        read_indices = reads_overlapping_variant(
            batch, variant, self.pileup_options.read_overlap_buffer_bp
        )
        alt_index = {a: i for i, a in enumerate(variant.alternate_bases)}
        locus = f"{variant.reference_name}:{variant.start + 1}-{variant.end}"
        for combo in alt_allele_combinations(variant):
            image = self.encoder.build_pileup(
                dv_call, ref_window, batch, read_indices, combo
            )
            indices = sorted(alt_index[a] for a in combo if a in alt_index)
            label = None
            if label_fn is not None:
                label = label_fn(variant, indices)
            encoded = example_codec.make_example(
                variant,
                image,
                indices,
                locus,
                sequencing_type=self.sequencing_type,
                label=label,
            )
            yield BuiltExample(encoded, variant, indices, image, label)

    def example_shape(self) -> Tuple[int, int, int]:
        o = self.pileup_options
        return (o.height, o.width, len(o.channels))

    def channel_enums(self) -> List[int]:
        return list(self.pileup_options.channels)
