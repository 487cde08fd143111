"""GBZ (gbwtgraph) pangenome container: reader, writer, panel export.

Re-implements, from the published format documents, the subset of the
GBZ stack the pangenome-aware pipeline needs (the reference links the
full gbwt/gbwtgraph C++ libraries instead — nucleus/io/gbz_reader.cc):

  * simple-sds serialization primitives (https://github.com/jltsiren/
    simple-sds SERIALIZATION.md): everything is little-endian u64
    elements; vectors carry length headers; optional structures are
    length-prefixed and absent = 0.
  * GBWT (https://github.com/jltsiren/gbwt SERIALIZATION.md): header,
    tags, run-length-encoded BWT of haplotype paths with byte-coded
    edges, and metadata (sample/contig/path names).
  * GBWTGraph/GBZ (https://github.com/jltsiren/gbwtgraph
    SERIALIZATION.md): GBZ = header + tags + GBWT + graph, where the
    graph stores node sequences as a StringArray.

Scope notes (kept honest):
  * Reading and writing round-trip each other and the layouts follow
    the format documents, but no external .gbz file ships in this
    image (none in the reference checkout either), so cross-validation
    against files produced by vg/gbwt itself is still pending.
  * Path extraction supports the haplotype-panel use case: decode
    every path, project it onto the chosen reference-sample path, and
    emit alignment records (position + CIGAR vs the linear reference)
    that the multisample pangenome pipeline consumes in place of a
    surjected BAM.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from deepvariant_tpu.core.types import Range, Read

# Format tags (gbwt/support.h, gbwtgraph/gbz.h).
GBWT_TAG = 0x6B376B37
GBWT_VERSION = 5
METADATA_TAG = 0x6B375E7A
METADATA_VERSION = 2
GBZ_TAG = 0x205A4247  # "GBZ "
GBZ_VERSION = 1
GRAPH_TAG = 0x6B3764AF
GRAPH_VERSION = 3

ENDMARKER = 0

# Byte-translation fast path of core.sequence_utils.reverse_complement
# (node sequences are strict upper/lower ACGT).
_COMPLEMENT = bytes.maketrans(b"ACGTacgt", b"TGCAtgca")


def _revcomp(seq: str) -> str:
    return seq.encode().translate(_COMPLEMENT)[::-1].decode()


# ---------------------------------------------------------------------------
# simple-sds primitives
# ---------------------------------------------------------------------------

class _Writer:
    def __init__(self):
        self.parts: List[bytes] = []

    def u64(self, v: int):
        self.parts.append(struct.pack("<Q", v))

    def pair32(self, lo: int, hi: int):
        self.parts.append(struct.pack("<II", lo, hi))

    def byte_vector(self, data: bytes):
        # Vector<u8>: element count then data padded to 8 bytes.
        self.u64(len(data))
        pad = (-len(data)) % 8
        self.parts.append(data + b"\x00" * pad)

    def u64_vector(self, values: Sequence[int]):
        self.u64(len(values))
        for v in values:
            self.u64(v)

    def raw_vector(self, bits: np.ndarray):
        """RawVector: bit length, then the words as Vector<u64>."""
        n = len(bits)
        self.u64(n)
        words = np.packbits(
            np.asarray(bits, np.uint8), bitorder="little"
        ).tobytes()
        pad = (-len(words)) % 8
        words = words + b"\x00" * pad
        self.u64(len(words) // 8)
        self.parts.append(words)

    def int_vector(self, values: Sequence[int], width: int):
        """IntVector: item count, bit width, RawVector payload."""
        self.u64(len(values))
        self.u64(width)
        bits = np.zeros(len(values) * width, np.uint8)
        for i, v in enumerate(values):
            for b in range(width):
                bits[i * width + b] = (v >> b) & 1
        self.raw_vector(bits)

    def bit_vector(self, bits: np.ndarray):
        """BitVector: RawVector + 4 absent support structures."""
        self.raw_vector(bits)
        for _ in range(4):
            self.u64(0)  # absent optional supports

    def sparse_vector(self, ones: Sequence[int], universe: int):
        """SparseVector (Elias-Fano): len, count, high BitVector, low
        IntVector."""
        ones = sorted(ones)
        n = max(len(ones), 1)
        self.u64(universe)
        self.u64(len(ones))
        low_width = max(1, (universe // n).bit_length() - 1) \
            if universe > 0 else 1
        high = np.zeros(len(ones) + (universe >> low_width) + 1, np.uint8)
        lows = []
        for i, pos in enumerate(ones):
            hi = pos >> low_width
            high[i + hi] = 1
            lows.append(pos & ((1 << low_width) - 1))
        self.bit_vector(high)
        self.int_vector(lows, low_width)

    def string_array(self, strings: Sequence[str]):
        """StringArray: index SparseVector of string starts over the
        concatenated bytes, then the bytes as Vector<u8>."""
        data = "".join(strings).encode()
        starts = []
        off = 0
        for s in strings:
            starts.append(off)
            off += len(s.encode())
        self.sparse_vector(starts, len(data) + 1)
        self.byte_vector(data)

    def dictionary(self, strings: Sequence[str]):
        self.string_array(strings)
        order = sorted(range(len(strings)), key=lambda i: strings[i])
        width = max(1, max(len(strings) - 1, 1).bit_length())
        self.int_vector(order, width)

    def blob(self) -> bytes:
        return b"".join(self.parts)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u64(self) -> int:
        (v,) = struct.unpack_from("<Q", self.data, self.pos)
        self.pos += 8
        return v

    def pair32(self) -> Tuple[int, int]:
        lo, hi = struct.unpack_from("<II", self.data, self.pos)
        self.pos += 8
        return lo, hi

    def byte_vector(self) -> bytes:
        n = self.u64()
        out = self.data[self.pos : self.pos + n]
        self.pos += n + ((-n) % 8)
        return out

    def u64_vector(self) -> List[int]:
        n = self.u64()
        out = list(
            struct.unpack_from(f"<{n}Q", self.data, self.pos)
        ) if n else []
        self.pos += 8 * n
        return out

    def raw_vector(self) -> np.ndarray:
        n_bits = self.u64()
        n_words = self.u64()
        raw = np.frombuffer(
            self.data, np.uint8, count=8 * n_words, offset=self.pos
        )
        self.pos += 8 * n_words
        return np.unpackbits(raw, bitorder="little")[:n_bits]

    def int_vector(self) -> List[int]:
        count = self.u64()
        width = self.u64()
        bits = self.raw_vector()
        out = []
        for i in range(count):
            v = 0
            for b in range(width):
                v |= int(bits[i * width + b]) << b
            out.append(v)
        return out

    def bit_vector(self) -> np.ndarray:
        bits = self.raw_vector()
        for _ in range(4):
            skip = self.u64()
            self.pos += 8 * skip
        return bits

    def sparse_positions(self) -> Tuple[List[int], int]:
        """SparseVector decoded to absolute positions."""
        universe = self.u64()
        count = self.u64()
        high = self.bit_vector()
        cnt = self.u64()
        width = self.u64()
        bits = self.raw_vector()
        lows = []
        for i in range(cnt):
            v = 0
            for b in range(width):
                v |= int(bits[i * width + b]) << b
            lows.append(v)
        positions = []
        seen = 0
        for idx in np.flatnonzero(high):
            hi = int(idx) - seen
            positions.append((hi << width) | lows[seen])
            seen += 1
            if seen == count:
                break
        return positions, universe

    def string_array(self) -> List[str]:
        starts, universe = self.sparse_positions()
        data = self.byte_vector()
        out = []
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < len(starts) else len(data)
            out.append(data[s:e].decode())
        return out

    def dictionary(self) -> List[str]:
        strings = self.string_array()
        self.int_vector()  # sorted ids (ignored on read)
        return strings


# ---------------------------------------------------------------------------
# Byte code + run-length encodings (gbwt/support.h ByteCode / Run)
# ---------------------------------------------------------------------------

def _write_varint(out: bytearray, value: int):
    while value >= 0x80:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)


def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    value = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if b < 0x80:
            return value, pos
        shift += 7


def _write_run(out: bytearray, sigma: int, value: int, length: int):
    """Run encoding (gbwt Run): for small alphabets a run packs into
    one byte `value + sigma * (len - 1)` while it fits; longer runs
    store the max-packed byte then the remaining length as a varint.
    For sigma >= 255 the value and length-1 are varints."""
    if sigma < 255:
        threshold = max(1, 256 // sigma)
        if length < threshold:
            out.append(value + sigma * (length - 1))
        else:
            out.append(value + sigma * (threshold - 1))
            _write_varint(out, length - threshold)
    else:
        _write_varint(out, value)
        _write_varint(out, length - 1)


def _read_run(data: bytes, pos: int, sigma: int) -> Tuple[int, int, int]:
    if sigma < 255:
        threshold = max(1, 256 // sigma)
        c = data[pos]
        pos += 1
        value = c % sigma
        length = c // sigma + 1
        if length == threshold:
            extra, pos = _read_varint(data, pos)
            length += extra
        return value, length, pos
    value, pos = _read_varint(data, pos)
    length, pos = _read_varint(data, pos)
    return value, length + 1, pos


# ---------------------------------------------------------------------------
# GBWT
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PathName:
    sample: int
    contig: int
    phase: int
    fragment: int


@dataclasses.dataclass
class GbwtMetadata:
    sample_names: List[str]
    contig_names: List[str]
    path_names: List[PathName]
    haplotype_count: int = 0


class Gbwt:
    """Decoded GBWT: per-node records + metadata; supports extract()."""

    def __init__(self):
        self.records: Dict[int, Tuple[List[Tuple[int, int]], List[Tuple[int, int]]]] = {}
        # node -> (edges [(successor, offset)], runs [(edge_rank, len)])
        self.sequences = 0
        self.metadata: Optional[GbwtMetadata] = None

    def extract(self, seq_id: int) -> List[int]:
        """Decode one path as a list of GBWT node ids (2*node|orient)."""
        out: List[int] = []
        node, offset = self._start(seq_id)
        while node != ENDMARKER:
            out.append(node)
            node, offset = self._lf(node, offset)
        return out

    def _edge_at_offset(self, node: int, offset: int) -> Tuple[int, int]:
        edges, runs = self.records[node]
        covered = 0
        occ = [0] * len(edges)
        for edge_rank, length in runs:
            if offset < covered + length:
                within = offset - covered
                return edge_rank, occ[edge_rank] + within
            occ[edge_rank] += length
            covered += length
        raise IndexError(f"offset {offset} beyond node {node} runs")

    def _start(self, seq_id: int) -> Tuple[int, int]:
        edges, _ = self.records[ENDMARKER]
        edge_rank, occ = self._edge_at_offset(ENDMARKER, seq_id)
        succ, succ_offset = edges[edge_rank]
        return succ, succ_offset + occ

    def _lf(self, node: int, offset: int) -> Tuple[int, int]:
        edges, _ = self.records[node]
        edge_rank, occ = self._edge_at_offset(node, offset)
        succ, succ_offset = edges[edge_rank]
        return succ, succ_offset + occ


def _write_gbwt(w: _Writer, paths: List[List[int]],
                metadata: GbwtMetadata):
    """Serialize paths (lists of GBWT node ids) as a GBWT."""
    # Build per-node records with true BWT ordering: the visit order of
    # sequences at node v is grouped by predecessor u (ascending u,
    # with the endmarker's starts first) and, within u, by the visit
    # order at u. Offsets of edge (u -> v) are then the rank of the
    # first (u -> v) arrival within v's order. Haplotype paths are
    # acyclic through the graph, so a topological pass settles this in
    # one sweep.
    succ_of: Dict[int, Dict[int, int]] = {}
    preds: Dict[int, set] = {}
    nodes = set()
    for seq_id, path in enumerate(paths):
        prev = ENDMARKER
        for node in path:
            nodes.add(node)
            succ_of.setdefault(prev, {})[seq_id] = node
            if prev != ENDMARKER:
                preds.setdefault(node, set()).add(prev)
            else:
                preds.setdefault(node, set()).add(ENDMARKER)
            prev = node
        succ_of.setdefault(prev, {})[seq_id] = ENDMARKER

    sigma = (max(nodes) + 1) if nodes else 1

    order: Dict[int, List[int]] = {ENDMARKER: list(range(len(paths)))}
    # Kahn topological order over the interior DAG.
    indeg = {v: len(ps - {ENDMARKER}) for v, ps in preds.items()}
    ready = [v for v in sorted(nodes) if indeg.get(v, 0) == 0]
    topo: List[int] = []
    while ready:
        v = ready.pop(0)
        topo.append(v)
        for w_ in sorted(nodes):
            if v in preds.get(w_, set()):
                indeg[w_] -= 1
                if indeg[w_] == 0:
                    ready.append(w_)
                    ready.sort()
    if len(topo) != len(nodes):
        raise ValueError("cyclic haplotype graph is not supported by "
                         "this writer")
    for v in topo:
        arr: List[int] = []
        for u in sorted(preds.get(v, set())):
            for seq in order[u]:
                if succ_of.get(u, {}).get(seq) == v:
                    arr.append(seq)
        order[v] = arr

    records: Dict[int, Tuple[List[Tuple[int, int]], List[Tuple[int, int]]]] = {}
    for u in [ENDMARKER] + topo:
        seq_list = order[u]
        succs = [succ_of[u][seq] for seq in seq_list] if seq_list else []
        edge_targets = sorted(set(succs))
        edges = []
        for v in edge_targets:
            if v == ENDMARKER:
                edges.append((ENDMARKER, 0))
                continue
            # rank in v's order of the first (u -> v) arrival = count
            # of v's arrivals from predecessors ordered before u.
            count_before = 0
            for up in sorted(preds.get(v, set())):
                if up == u:
                    break
                count_before += sum(
                    1 for seq in order[up]
                    if succ_of.get(up, {}).get(seq) == v
                )
            edges.append((v, count_before))
        rank = {v: i for i, (v, _) in enumerate(edges)}
        runs: List[Tuple[int, int]] = []
        for v in succs:
            rk = rank[v]
            if runs and runs[-1][0] == rk:
                runs[-1] = (rk, runs[-1][1] + 1)
            else:
                runs.append((rk, 1))
        records[u] = (edges, runs)

    # ---- serialize -------------------------------------------------------
    # header: tag|version, sequences, size, offset, alphabet_size, flags
    w.pair32(GBWT_TAG, GBWT_VERSION)
    w.u64(len(paths))
    w.u64(sum(len(p) + 1 for p in paths))
    w.u64(0)                      # alphabet offset
    w.u64(sigma)                  # alphabet size
    w.u64(0x4)                    # flags: simple-sds format
    # tags: StringArray of key/value pairs (source marker).
    w.string_array(["source", "deepvariant-tpu-gbz"])
    # BWT: index SparseVector over the byte array marking record starts.
    body = bytearray()
    starts = []
    for node in range(sigma):
        starts.append(len(body))
        if node not in records:
            _write_varint(body, 0)  # outdegree 0
            continue
        edges, runs = records[node]
        _write_varint(body, len(edges))
        prev = 0
        for succ, offset in edges:
            _write_varint(body, succ - prev)
            _write_varint(body, offset)
            prev = succ
        outdeg = len(edges)
        for edge_rank, length in runs:
            _write_run(body, max(outdeg, 1), edge_rank, length)
    w.sparse_vector(starts, len(body) + 1)
    w.byte_vector(bytes(body))
    # DA samples: absent.
    w.u64(0)
    # Metadata (optional, present).
    mw = _Writer()
    mw.pair32(METADATA_TAG, METADATA_VERSION)
    mw.u64(len(metadata.sample_names))
    mw.u64(metadata.haplotype_count or len(paths))
    mw.u64(len(metadata.contig_names))
    mw.u64(0x7)  # flags: path/sample/contig names present
    mw.u64_vector([
        (p.sample | (p.contig << 32))
        for p in metadata.path_names
    ])
    mw.u64_vector([
        (p.phase | (p.fragment << 32))
        for p in metadata.path_names
    ])
    mw.dictionary(metadata.sample_names)
    mw.dictionary(metadata.contig_names)
    blob = mw.blob()
    w.u64(len(blob) // 8)
    w.parts.append(blob)


def _read_gbwt(r: _Reader) -> Gbwt:
    tag, version = r.pair32()
    if tag != GBWT_TAG:
        raise ValueError(f"not a GBWT: tag {tag:#x}")
    g = Gbwt()
    g.sequences = r.u64()
    r.u64()  # size
    r.u64()  # offset
    sigma = r.u64()
    r.u64()  # flags
    r.string_array()  # tags
    starts, _ = r.sparse_positions()
    body = r.byte_vector()
    for node in range(len(starts)):
        pos = starts[node]
        end = starts[node + 1] if node + 1 < len(starts) else len(body)
        outdeg, pos = _read_varint(body, pos)
        if outdeg == 0:
            continue
        edges = []
        prev = 0
        for _ in range(outdeg):
            delta, pos = _read_varint(body, pos)
            offset, pos = _read_varint(body, pos)
            prev += delta
            edges.append((prev, offset))
        runs = []
        while pos < end:
            value, length, pos = _read_run(body, pos, max(outdeg, 1))
            runs.append((value, length))
        g.records[node] = (edges, runs)
    da = r.u64()
    r.pos += 8 * da
    meta_len = r.u64()
    if meta_len:
        mr = _Reader(r.data[r.pos : r.pos + 8 * meta_len])
        r.pos += 8 * meta_len
        mtag, _ = mr.pair32()
        if mtag != METADATA_TAG:
            raise ValueError("bad GBWT metadata tag")
        mr.u64()  # sample count
        hap_count = mr.u64()
        mr.u64()  # contig count
        mr.u64()  # flags
        lo = mr.u64_vector()
        hi = mr.u64_vector()
        path_names = [
            PathName(
                sample=a & 0xFFFFFFFF, contig=a >> 32,
                phase=b & 0xFFFFFFFF, fragment=b >> 32,
            )
            for a, b in zip(lo, hi)
        ]
        samples = mr.dictionary()
        contigs = mr.dictionary()
        g.metadata = GbwtMetadata(samples, contigs, path_names, hap_count)
    return g


# ---------------------------------------------------------------------------
# GBZ container
# ---------------------------------------------------------------------------

class GBZ:
    """A pangenome: GBWT paths + node sequences."""

    def __init__(self, gbwt: Gbwt, node_sequences: Dict[int, str]):
        self.gbwt = gbwt
        self.node_sequences = node_sequences

    # -- path helpers ------------------------------------------------------

    def path_bases(self, seq_id: int) -> str:
        out = []
        for gnode in self.gbwt.extract(seq_id):
            node, orient = gnode >> 1, gnode & 1
            seq = self.node_sequences[node]
            out.append(_revcomp(seq) if orient else seq)
        return "".join(out)

    def path_nodes(self, seq_id: int) -> List[int]:
        return self.gbwt.extract(seq_id)

    def paths_for_sample(self, sample_name: str) -> List[int]:
        md = self.gbwt.metadata
        if md is None:
            return []
        try:
            sid = md.sample_names.index(sample_name)
        except ValueError:
            return []
        return [
            i for i, p in enumerate(md.path_names) if p.sample == sid
        ]

    def contig_name(self, seq_id: int) -> str:
        md = self.gbwt.metadata
        return md.contig_names[md.path_names[seq_id].contig]

    # -- panel extraction --------------------------------------------------

    def haplotype_reads(
        self, reference_sample: str, region: Optional[Range] = None
    ) -> List[Read]:
        """Haplotype paths projected onto `reference_sample`'s path as
        alignment records (the GbzReader::Query analog): shared nodes
        become matches, bubbles become X/insertions/deletions via a
        node-anchored projection."""
        md = self.gbwt.metadata
        if md is None:
            raise ValueError("GBZ has no metadata; cannot find paths")
        ref_ids = self.paths_for_sample(reference_sample)
        if not ref_ids:
            raise ValueError(
                f"reference sample {reference_sample!r} has no paths; "
                f"samples: {md.sample_names}"
            )
        out: List[Read] = []
        for ref_seq in ref_ids:
            contig = self.contig_name(ref_seq)
            ref_nodes = self.gbwt.extract(ref_seq)
            node_offset: Dict[int, int] = {}
            off = 0
            for gnode in ref_nodes:
                node_offset[gnode] = off
                off += len(self.node_sequences[gnode >> 1])
            for seq_id in range(self.gbwt.sequences):
                if seq_id in ref_ids:
                    continue
                if self.contig_name(seq_id) != contig:
                    continue
                read = self._project_path(
                    seq_id, contig, node_offset
                )
                if read is None:
                    continue
                if region is not None and not (
                    read.position < region.end
                    and read.end() > region.start
                ):
                    continue
                out.append(read)
        return out

    def _project_path(
        self, seq_id: int, contig: str, ref_offset: Dict[int, int]
    ) -> Optional[Read]:
        nodes = self.gbwt.extract(seq_id)
        anchored = [n for n in nodes if n in ref_offset]
        if not anchored:
            return None
        start = ref_offset[anchored[0]]
        cigar: List[Tuple[int, int]] = []
        bases: List[str] = []

        def emit(op: int, length: int):
            if length <= 0:
                return
            if cigar and cigar[-1][0] == op:
                cigar[-1] = (op, cigar[-1][1] + length)
            else:
                cigar.append((op, length))

        # Leading unanchored nodes become soft clips.
        i = 0
        lead = 0
        while i < len(nodes) and nodes[i] not in ref_offset:
            seq = self._oriented(nodes[i])
            bases.append(seq)
            lead += len(seq)
            i += 1
        if lead:
            emit(5, lead)  # CLIP_SOFT

        prev_end = None
        while i < len(nodes):
            gnode = nodes[i]
            if gnode in ref_offset:
                off = ref_offset[gnode]
                seq = self._oriented(gnode)
                if prev_end is not None and off > prev_end:
                    emit(3, off - prev_end)  # DELETE covers skipped ref
                bases.append(seq)
                emit(1, len(seq))  # ALIGNMENT_MATCH
                prev_end = off + len(seq)
                i += 1
            else:
                # Bubble: insertion until the next anchored node.
                ins = 0
                while i < len(nodes) and nodes[i] not in ref_offset:
                    seq = self._oriented(nodes[i])
                    bases.append(seq)
                    ins += len(seq)
                    i += 1
                emit(2, ins)  # INSERT
        read_bases = "".join(bases)
        md = self.gbwt.metadata
        pname = md.path_names[seq_id]
        name = (
            f"{md.sample_names[pname.sample]}_"
            f"{self.contig_name(seq_id)}_{pname.phase}_{pname.fragment}"
        )
        return Read(
            fragment_name=name,
            aligned_sequence=read_bases,
            aligned_quality=bytes([60] * len(read_bases)),
            reference_name=contig,
            position=start,
            mapping_quality=60,
            cigar=cigar,
        )

    def _oriented(self, gnode: int) -> str:
        seq = self.node_sequences[gnode >> 1]
        return _revcomp(seq) if gnode & 1 else seq


def write_gbz(
    path: str,
    node_sequences: Dict[int, str],
    paths: List[List[int]],
    metadata: GbwtMetadata,
) -> None:
    """Serialize a GBZ file: header + tags + GBWT + GBWTGraph."""
    w = _Writer()
    w.pair32(GBZ_TAG, GBZ_VERSION)
    w.string_array([])  # GBZ tags
    _write_gbwt(w, paths, metadata)
    # Graph: header (tag|version, nodes, flags), sequences StringArray.
    w.pair32(GRAPH_TAG, GRAPH_VERSION)
    max_node = max(node_sequences) if node_sequences else 0
    w.u64(len(node_sequences))
    w.u64(0x2)  # flags: simple-sds
    seqs = [
        node_sequences.get(n, "") for n in range(max_node + 1)
    ]
    w.string_array(seqs)
    w.u64(0)  # node-to-segment translation: absent
    with open(path, "wb") as f:
        f.write(w.blob())


def read_gbz(path: str) -> GBZ:
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    tag, _ = r.pair32()
    if tag != GBZ_TAG:
        raise ValueError(
            f"{path}: not a GBZ file (tag {tag:#x}, expected GBZ)"
        )
    r.string_array()  # tags
    gbwt = _read_gbwt(r)
    gtag, _ = r.pair32()
    if gtag != GRAPH_TAG:
        raise ValueError(f"bad GBWTGraph tag {gtag:#x}")
    r.u64()  # node count
    r.u64()  # flags
    seqs = r.string_array()
    node_sequences = {i: s for i, s in enumerate(seqs) if s}
    return GBZ(gbwt, node_sequences)


def extract_panel_bam(
    gbz_path: str,
    ref_fasta: str,
    out_bam: str,
    reference_sample: str = "GRCh38",
    regions: Optional[Sequence[str]] = None,
) -> str:
    """Decode a .gbz haplotype panel into an indexed BAM the pangenome
    pipeline consumes (replaces the reference's in-memory GbzReader
    queries; load_gbz_into_shared_memory.py's role is unnecessary in
    our single-process design)."""
    from deepvariant_tpu.io.bam_writer import BamWriter, build_bam_index
    from deepvariant_tpu.io.fasta import FastaReader

    gbz = read_gbz(gbz_path)
    ref = FastaReader(ref_fasta)
    reads = gbz.haplotype_reads(reference_sample)
    reads.sort(key=lambda rd: (rd.reference_name, rd.position))
    with BamWriter(out_bam, ref.contigs) as writer:
        for read in reads:
            writer.write_read(read)
    build_bam_index(out_bam)
    return out_bam
