"""Small-model tests: feature encoding + MLP gate."""

import numpy as np
import pytest

from deepvariant_tpu.core.cigar import parse_cigar_string
from deepvariant_tpu.core.types import Read, Variant
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.make_examples.variant_caller import DeepVariantCall
from deepvariant_tpu.small_model.features import (
    BASE_FEATURES,
    SmallModelExampleFactory,
    VARIANT_FEATURES,
)
from deepvariant_tpu.small_model.model import (
    SmallModelVariantCaller,
    create_small_model,
    passes_confidence_threshold,
)

CHROM = "chr1"


def _batch(n_reads=8):
    reads = []
    for i in range(n_reads):
        reads.append(Read(
            fragment_name=f"r{i}",
            aligned_sequence="ACGT" * 10,
            aligned_quality=bytes([30 + (i % 3)] * 40),
            reference_name=CHROM,
            position=100,
            mapping_quality=60 if i % 2 == 0 else 20,
            cigar=parse_cigar_string("40M"),
            reverse_strand=(i % 2 == 1),
        ))
    return ReadBatch.from_reads(reads, [CHROM])


def _candidate(alts=("T",), alt_reads=((0, 1, 2),), ref_reads=(3, 4, 5)):
    return DeepVariantCall(
        variant=Variant(
            reference_name=CHROM, start=110, end=111,
            reference_bases="A", alternate_bases=list(alts),
        ),
        allele_support={
            a: list(r) for a, r in zip(alts, alt_reads)
        },
        ref_support=list(ref_reads),
    )


class TestFeatures:
    def test_feature_vector_values(self):
        factory = SmallModelExampleFactory()
        cand = _candidate()
        vec = factory.encode(cand, (0,), _batch())
        names = factory.model_feature_names()
        assert len(vec) == len(names) == len(BASE_FEATURES) + len(
            VARIANT_FEATURES
        )
        f = dict(zip(names, vec))
        assert f["num_reads_supports_ref"] == 3
        assert f["num_reads_supports_alt"] == 3
        assert f["total_depth"] == 6
        assert f["variant_allele_frequency"] == 50
        assert f["is_snp"] == 1
        assert f["is_insertion"] == 0
        # reads 0,1,2: mapq 60,20,60 -> mean 46 (floor)
        assert f["alt_mapping_quality"] == 46
        # reverse strand: reads 1 of 0,1,2 -> 33
        assert f["alt_reverse_strand_ratio"] == 33

    def test_indel_features(self):
        factory = SmallModelExampleFactory()
        cand = _candidate(alts=("ATT",))
        vec = factory.encode(cand, (0,), _batch())
        f = dict(zip(factory.model_feature_names(), vec))
        assert f["is_snp"] == 0
        assert f["is_insertion"] == 1
        assert f["insertion_length"] == 2

    def test_multiallelic_index_sets(self):
        factory = SmallModelExampleFactory()
        cand = _candidate(alts=("T", "G"), alt_reads=((0, 1), (2,)))
        assert factory.alt_index_sets(cand) == [(0,), (1,), (0, 1)]

    def test_haplotype_expansion(self):
        factory = SmallModelExampleFactory(expand_by_haplotype=True)
        cand = _candidate()
        phases = [1, 1, 2, 0, 1, 2, 0, 0]
        vec = factory.encode(cand, (0,), _batch(), read_phases=phases)
        assert len(vec) == len(BASE_FEATURES) + len(VARIANT_FEATURES) + \
            3 * len(BASE_FEATURES)


class TestGate:
    def test_confidence_threshold(self):
        assert passes_confidence_threshold([0.01, 0.98, 0.01], 15)
        assert not passes_confidence_threshold([0.4, 0.3, 0.3], 15)

    def test_call_variants_gate(self):
        factory = SmallModelExampleFactory()
        model, variables = create_small_model(
            len(factory.model_feature_names()), hidden_layer_sizes=(16,)
        )
        caller = SmallModelVariantCaller(
            model, variables, snp_gq_threshold=25, indel_gq_threshold=30
        )
        batch = _batch()
        cand = _candidate()
        # Zero features -> exactly uniform softmax -> below threshold.
        zero_rows = np.zeros(
            (1, len(factory.model_feature_names())), np.float32
        )
        result = caller.call_variants([(0, cand, (0,))], zero_rows)
        assert result.cvos == [] and result.filtered_indices == []
        # emit_all_candidates (debug) writes every CVO but keeps every
        # candidate on the CNN path too (inference.py:185-193: the
        # candidate lands in candidates_not_called regardless).
        caller.emit_all_candidates = True
        rows = np.stack([factory.encode(cand, (0,), batch)])
        result = caller.call_variants([(0, cand, (0,))], rows)
        assert len(result.cvos) == 1
        assert result.filtered_indices == []
        assert result.accepted_sets == []
        assert abs(sum(result.cvos[0].genotype_probabilities) - 1) < 1e-9


class TestSmallModelTraining:
    def _write_rows(self, path, n=120, n_features=10, seed=0):
        from deepvariant_tpu.io.tfrecord import TFRecordWriter
        from deepvariant_tpu.small_model.train import (
            encode_training_example,
        )

        rng = np.random.RandomState(seed)
        with TFRecordWriter(path) as w:
            for _ in range(n):
                label = rng.randint(0, 3)
                # Separable features: mean tracks the label.
                feats = rng.randint(0, 20, n_features) + label * 40
                w.write(encode_training_example(
                    [int(f) for f in feats], int(label), ids=["c", "1"]
                ))

    def test_codec_roundtrip(self):
        from deepvariant_tpu.small_model.train import (
            decode_training_example,
            encode_training_example,
        )

        buf = encode_training_example([1, 2, 3], 2, ids=["chr1", "5"])
        x, y = decode_training_example(buf)
        np.testing.assert_array_equal(x, [1, 2, 3])
        assert y == 2

    def test_train_learns_separable_data(self, tmp_path):
        from deepvariant_tpu.small_model.train import (
            get_config,
            train_small_model,
        )

        rows = str(tmp_path / "rows.tfrecord")
        self._write_rows(rows)
        metrics = train_small_model(
            rows, str(tmp_path / "out"), get_config("test"),
        )
        assert metrics["train_accuracy"] > 0.9
        assert (tmp_path / "out" / "small_model.msgpack").exists()
        assert (tmp_path / "out" / "small_model.json").exists()

    def test_sub_batch_corpus_still_trains(self, tmp_path):
        """A corpus smaller than one batch must still take gradient
        steps — the 1024 default batch over a few hundred rows
        previously produced zero steps and returned the random init
        (train_accuracy ~0.33)."""
        import numpy as np

        from deepvariant_tpu.io.tfrecord import TFRecordWriter
        from deepvariant_tpu.small_model.train import (
            SmallModelTrainConfig,
            encode_training_example,
            train_small_model,
        )

        rng = np.random.RandomState(0)
        path = str(tmp_path / "rows.tfrecord")
        with TFRecordWriter(path) as w:
            for _ in range(60):  # < any production batch size
                label = rng.randint(3)
                feats = rng.randint(0, 5, size=8)
                feats[0] = label * 40  # separable signal
                w.write(encode_training_example(feats.tolist(), label))
        metrics = train_small_model(
            path, str(tmp_path / "out"),
            SmallModelTrainConfig(
                hidden_layer_sizes=(16,), batch_size=1024,
                num_epochs=60, learning_rate=1e-2,
            ),
        )
        assert metrics["train_accuracy"] > 0.9
        assert metrics["train_loss"] < 1.0

    def test_trained_bundle_loads_into_gate(self, tmp_path):
        import flax.serialization as serialization

        from deepvariant_tpu.small_model.model import (
            SmallModelMLP,
            SmallModelVariantCaller,
            create_small_model,
        )
        from deepvariant_tpu.small_model.train import (
            get_config,
            train_small_model,
        )

        rows = str(tmp_path / "rows.tfrecord")
        self._write_rows(rows)
        train_small_model(rows, str(tmp_path / "out"),
                          get_config("test"))
        model, variables = create_small_model(
            10, hidden_layer_sizes=(32, 32)
        )
        with open(str(tmp_path / "out" / "small_model.msgpack"),
                  "rb") as f:
            bundle = serialization.from_bytes(
                {"params": variables,
                 "mean": np.zeros(10), "scale": np.ones(10)},
                f.read(),
            )
        caller = SmallModelVariantCaller(model, bundle["params"])
        caller.feature_mean = np.asarray(bundle["mean"])
        caller.feature_scale = np.asarray(bundle["scale"])
        rng = np.random.RandomState(1)
        x = (rng.randint(0, 20, (8, 10)) + 2 * 40).astype(np.float32)
        probs = caller.classify(x)
        assert probs.shape == (8, 3)
        # Class-2-like rows classify as class 2.
        assert (np.argmax(probs, axis=1) == 2).mean() > 0.8


class TestReferenceFeatureTable:
    """make_small_model_examples_test.py:40-410 base-feature table on
    the FAKE_VARIANT_CALL_HET fixture (exact integer feature values)."""

    def _fixture(self):
        # ref reads: mapq 60/20/40, avg baseq 30/35/25, strand F/T/T;
        # alt "C" reads: mapq 60/30/60, baseq 50/60/40, strand F/F/F.
        specs = [
            (60, 30, False), (20, 35, True), (40, 25, True),
            (60, 50, False), (30, 60, False), (60, 40, False),
        ]
        reads = [
            Read(
                fragment_name=f"read_{i + 1}",
                aligned_sequence="ACGT" * 5,
                aligned_quality=bytes([bq] * 20),
                reference_name=CHROM,
                position=4990,
                mapping_quality=mq,
                cigar=parse_cigar_string("20M"),
                reverse_strand=rev,
            )
            for i, (mq, bq, rev) in enumerate(specs)
        ]
        batch = ReadBatch.from_reads(reads, [CHROM])
        candidate = DeepVariantCall(
            variant=Variant(
                reference_name=CHROM, start=5000, end=5001,
                reference_bases="A", alternate_bases=["C"],
            ),
            allele_support={"C": [3, 4, 5]},
            ref_support=[0, 1, 2],
        )
        return batch, candidate

    def test_base_feature_table(self):
        from deepvariant_tpu.small_model.features import FeatureEncoder

        batch, candidate = self._fixture()
        enc = FeatureEncoder(candidate, (0,), batch)
        values = dict(zip(BASE_FEATURES, enc.base_feature_values()))
        assert values["num_reads_supports_ref"] == 3
        assert values["num_reads_supports_alt"] == 3
        assert values["alt_indices_depth"] == 6
        assert values["total_depth"] == 6
        assert values["variant_allele_frequency"] == 50
        assert values["alt_indices_variant_allele_frequency"] == 50
        assert values["ref_mapping_quality"] == 40
        assert values["alt_mapping_quality"] == 50
        assert values["ref_base_quality"] == 30
        assert values["alt_base_quality"] == 50
        assert values["ref_reverse_strand_ratio"] == 66
        assert values["alt_reverse_strand_ratio"] == 0

    def test_multiallelic_depths(self):
        from deepvariant_tpu.small_model.features import FeatureEncoder

        # ref 3 reads; alts AC:2, ACC:2, ACCC:2 (total depth 9).
        reads = [
            Read(
                fragment_name=f"r{i}", aligned_sequence="ACGT" * 5,
                aligned_quality=bytes([30] * 20),
                reference_name=CHROM, position=4990,
                mapping_quality=60,
                cigar=parse_cigar_string("20M"),
            )
            for i in range(9)
        ]
        batch = ReadBatch.from_reads(reads, [CHROM])
        candidate = DeepVariantCall(
            variant=Variant(
                reference_name=CHROM, start=5000, end=5001,
                reference_bases="A",
                alternate_bases=["AC", "ACC", "ACCC"],
            ),
            allele_support={"AC": [3, 4], "ACC": [5, 6],
                            "ACCC": [7, 8]},
            ref_support=[0, 1, 2],
        )
        enc = FeatureEncoder(candidate, (0, 1), batch)
        values = dict(zip(BASE_FEATURES, enc.base_feature_values()))
        assert values["alt_indices_depth"] == 7
        assert values["total_depth"] == 9
        # 4 alt reads over the 7 alt-indices reads -> 57.
        assert values["alt_indices_variant_allele_frequency"] == 57

    def test_variant_feature_flags(self):
        from deepvariant_tpu.small_model.features import FeatureEncoder

        batch, _ = self._fixture()

        def flags(ref, alts):
            cand = DeepVariantCall(
                variant=Variant(
                    reference_name=CHROM, start=5000,
                    end=5000 + len(ref), reference_bases=ref,
                    alternate_bases=list(alts),
                ),
                allele_support={a: [] for a in alts},
            )
            enc = FeatureEncoder(cand, (0,), batch)
            return dict(zip(VARIANT_FEATURES,
                            enc.variant_feature_values()))

        ins = flags("A", ["AAC"])
        assert (ins["is_snp"], ins["is_insertion"],
                ins["is_deletion"]) == (0, 1, 0)
        assert ins["insertion_length"] == 2
        dele = flags("AACC", ["C"])
        assert (dele["is_snp"], dele["is_insertion"],
                dele["is_deletion"]) == (0, 0, 1)
        assert dele["deletion_length"] == 3
        snp = flags("A", ["C"])
        assert (snp["is_snp"], snp["is_insertion"],
                snp["is_deletion"]) == (1, 0, 0)


class TestPartialAcceptance:
    def test_restricted_alt_combinations(self):
        """Partially accepted multiallelics reach the CNN with only the
        remaining alt-index sets (AltAlleleCombinationsFromIndices,
        make_examples_native.cc:234-268)."""
        from deepvariant_tpu.core.types import Variant
        from deepvariant_tpu.make_examples.examples_builder import (
            alt_allele_combinations,
        )

        v = Variant(
            reference_name="chr1", start=10, end=11,
            reference_bases="A", alternate_bases=["C", "G"],
        )
        assert alt_allele_combinations(v) == [["C"], ["G"], ["C", "G"]]
        assert alt_allele_combinations(
            v, allowed_alt_index_sets=[(1,), (0, 1)]
        ) == [["G"], ["C", "G"]]
        assert alt_allele_combinations(
            v, "no_het_alt", allowed_alt_index_sets=[(1,), (0, 1)]
        ) == [["G"]]
        assert alt_allele_combinations(
            v, allowed_alt_index_sets=[]
        ) == []
