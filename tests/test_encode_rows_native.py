"""Native batch row painter (dv_encode_rows) vs the Python encoder.

Property test: for randomized reads — mixed cigars (M/I/D/S/H), low
mapping/base qualities, off-window spans, crowded windows past the row
cap — build_pileup through the native painter must be bit-identical to
the pure-Python encode_read_row loop.
"""

import numpy as np
import pytest

from deepvariant_tpu.core.cigar import parse_cigar_string
from deepvariant_tpu.core.types import Read, Variant
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.make_examples.pileup import (
    DEFAULT_CHANNELS,
    CH_INSERT_SIZE,
    CH_HAPLOTYPE_TAG,
    CH_ALLELE_FREQUENCY,
    PileupEncoder,
    PileupOptions,
)
from deepvariant_tpu.make_examples.variant_caller import DeepVariantCall

CHROM = "chr1"


def _random_read(rng, ref_len, name):
    start = int(rng.integers(0, ref_len - 5))
    n_ops = int(rng.integers(1, 5))
    cigar = []
    read_len = 0
    for i in range(n_ops):
        op = rng.choice(["M", "M", "M", "I", "D", "S"])
        length = int(rng.integers(1, 8))
        if op in ("M", "I", "S"):
            read_len += length
        cigar.append(f"{length}{op}")
    if read_len == 0:
        cigar.append("5M")
        read_len = 5
    seq = "".join(rng.choice(list("ACGT"), read_len))
    quals = bytes(int(q) for q in rng.integers(2, 60, read_len))
    return Read(
        fragment_name=name,
        aligned_sequence=seq,
        aligned_quality=quals,
        reference_name=CHROM,
        position=start,
        mapping_quality=int(rng.integers(0, 60)),
        cigar=parse_cigar_string("".join(cigar)),
        reverse_strand=bool(rng.integers(0, 2)),
        fragment_length=int(rng.integers(-1500, 1500)),
    )


def _build_both(encoder, dv_call, ref_window, batch, indices, alts,
                monkeypatch):
    native_img = encoder.build_pileup(
        dv_call, ref_window, batch, indices, alts
    )
    with monkeypatch.context() as m:
        m.setattr(
            PileupEncoder, "_encode_rows_batch",
            lambda self, *a, **k: None,
        )
        python_img = encoder.build_pileup(
            dv_call, ref_window, batch, indices, alts
        )
    return native_img, python_img


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_python_randomized(seed, monkeypatch):
    rng = np.random.default_rng(seed)
    ref = "".join(rng.choice(list("ACGT"), 200))
    opts = PileupOptions(
        width=21, height=15,
        channels=tuple(DEFAULT_CHANNELS + [CH_INSERT_SIZE]),
    )
    encoder = PileupEncoder(opts)
    reads = [_random_read(rng, len(ref), f"r{i}") for i in range(40)]
    batch = ReadBatch.from_reads(reads, [CHROM])
    start = 100
    v = Variant(
        reference_name=CHROM, start=start, end=start + 1,
        reference_bases=ref[start], alternate_bases=["T"],
    )
    support = {"T": set(int(i) for i in rng.integers(0, 40, 10))}
    dv_call = DeepVariantCall(variant=v, allele_support=support)
    lo = start - opts.half_width
    ref_window = np.frombuffer(
        ref[lo:lo + opts.width].encode(), np.uint8
    )
    indices = list(range(len(reads)))
    native_img, python_img = _build_both(
        encoder, dv_call, ref_window, batch, indices, ("T",), monkeypatch
    )
    assert np.array_equal(native_img, python_img)


def test_native_matches_python_crowded_cap(monkeypatch):
    """More kept reads than rows: the native early-stop must pick the
    same prefix as the python loop's break."""
    rng = np.random.default_rng(99)
    ref = "".join(rng.choice(list("ACGT"), 120))
    opts = PileupOptions(width=11, height=8, channels=tuple(
        DEFAULT_CHANNELS
    ))
    encoder = PileupEncoder(opts)
    # All reads overlap the call; far more than max_reads (3).
    reads = [
        Read(
            fragment_name=f"q{i}",
            aligned_sequence=ref[50:70],
            aligned_quality=bytes([30] * 20),
            reference_name=CHROM,
            position=50,
            mapping_quality=40,
            cigar=parse_cigar_string("20M"),
            reverse_strand=False,
            fragment_length=0,
        )
        for i in range(12)
    ]
    batch = ReadBatch.from_reads(reads, [CHROM])
    v = Variant(
        reference_name=CHROM, start=55, end=56,
        reference_bases=ref[55], alternate_bases=["A"],
    )
    dv_call = DeepVariantCall(variant=v, allele_support={})
    lo = 55 - opts.half_width
    ref_window = np.frombuffer(
        ref[lo:lo + opts.width].encode(), np.uint8
    )
    native_img, python_img = _build_both(
        encoder, dv_call, ref_window, batch, list(range(12)), ("A",),
        monkeypatch,
    )
    assert np.array_equal(native_img, python_img)


def test_native_matches_python_hp_and_af(monkeypatch):
    """Haplotype-tag + allele-frequency const channels."""
    rng = np.random.default_rng(7)
    ref = "".join(rng.choice(list("ACGT"), 120))
    opts = PileupOptions(
        width=15, height=10,
        channels=tuple(DEFAULT_CHANNELS
                       + [CH_HAPLOTYPE_TAG, CH_ALLELE_FREQUENCY]),
        sort_by_haplotypes=True,
    )
    encoder = PileupEncoder(opts)
    reads = [_random_read(rng, len(ref), f"h{i}") for i in range(25)]
    batch = ReadBatch.from_reads(reads, [CHROM])
    batch.hp = rng.integers(0, 3, len(reads)).astype(np.int8)
    v = Variant(
        reference_name=CHROM, start=60, end=61,
        reference_bases=ref[60], alternate_bases=["G"],
    )
    dv_call = DeepVariantCall(
        variant=v,
        allele_support={"G": {0, 3, 5}},
        allele_frequencies={"G": 0.25},
    )
    lo = 60 - opts.half_width
    ref_window = np.frombuffer(
        ref[lo:lo + opts.width].encode(), np.uint8
    )
    native_img, python_img = _build_both(
        encoder, dv_call, ref_window, batch, list(range(25)), ("G",),
        monkeypatch,
    )
    assert np.array_equal(native_img, python_img)
