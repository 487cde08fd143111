"""Device long-read encoder: pixel parity with the host encoder.

VERDICT r2 gap #3: the fused/device encoder served only the WGS
channel set, locking PacBio/ONT presets out of the fused TPU path.
These tests drive the PACBIO preset configuration (channels 1-7 + 26,
diff_channels alt alignment, haplotype-sorted rows, trimmed reads, no
realigner) over the reference's real PacBio golden workload and assert
the device images are BIT-IDENTICAL to the host encoder's.

Reference equivalents: alt_aligned_pileup_lib.h:75,
pileup_image_native.cc:74-153.
"""

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.make_examples.core import (
    MakeExamplesOptions,
    RegionProcessor,
)
from deepvariant_tpu.make_examples.examples_builder import (
    alt_allele_combinations,
)
from deepvariant_tpu.make_examples.pileup_jax import (
    DEVICE_CHANNELS,
    encode_longread_examples,
    make_longread_encode_fn,
    plan_longread_example,
)
from deepvariant_tpu.make_examples.presets import apply_model_preset

TESTDATA = "/root/reference/deepvariant/testdata"


def test_device_channels_cover_pacbio_preset():
    """Done-criterion from VERDICT r2 #3: DEVICE_CHANNELS superset of
    the PACBIO/ONT preset channel set."""
    options = MakeExamplesOptions()
    apply_model_preset(options, "PACBIO")
    assert set(options.pileup_options.channels) <= DEVICE_CHANNELS
    options = MakeExamplesOptions()
    apply_model_preset(options, "ONT_R104")
    assert set(options.pileup_options.channels) <= DEVICE_CHANNELS


@pytest.mark.integration
def test_longread_device_parity_on_pacbio_goldens(monkeypatch):
    """Every example of the 401-example PacBio golden workload,
    device-encoded bit-identical to the host encoder (all 10 planes,
    diff channels included)."""
    options = MakeExamplesOptions(
        reads_filename=(
            f"{TESTDATA}/input/test_pacbio.chr20_100kbp_at_9mb.bam"
        ),
        ref_filename=f"{TESTDATA}/input/grch38.chr20_and_21_10M.fa.gz",
        examples_filename="",
        mode="calling",
        regions=["chr20:9,000,000-9,100,000"],
    )
    apply_model_preset(options, "PACBIO")
    processor = RegionProcessor(options)
    builder = processor.examples_builder
    o = builder.pileup_options

    captured = []
    original = type(builder).build_examples_for_candidate

    def capture(self, dv_call, batch, label_fn=None, **kwargs):
        built = list(original(self, dv_call, batch, label_fn=label_fn,
                              **kwargs))
        captured.append((dv_call, batch, [b.image for b in built]))
        return built

    monkeypatch.setattr(
        type(builder), "build_examples_for_candidate", capture
    )

    from deepvariant_tpu.make_examples.core import (
        calling_regions_from_options,
        regions_to_process,
    )

    contigs = processor.ref_reader.contigs
    calling_regions = calling_regions_from_options(options, contigs)
    regions = regions_to_process(
        contigs, options.partition_size, calling_regions,
        options.task_id, options.num_shards,
    )
    n_host_examples = 0
    for region in regions:
        outputs = processor.process(region)
        n_host_examples += len(outputs.examples)
    assert n_host_examples == 401  # the golden workload

    encode_fn = make_longread_encode_fn(o)
    compared = exact = 0
    for dv_call, batch, host_images in captured:
        combos = list(alt_allele_combinations(
            dv_call.variant, o.multi_allelic_mode
        ))
        assert len(combos) == len(host_images)
        plans = []
        for combo in combos:
            plan = plan_longread_example(builder, dv_call, batch, combo)
            assert plan is not None
            plans.append(plan)
        device_images = encode_longread_examples(
            builder, plans, encode_fn=encode_fn
        )
        for host_img, dev_img in zip(host_images, device_images):
            assert host_img.shape == dev_img.shape == (100, 147, 10)
            compared += 1
            exact += bool((host_img == dev_img).all())
    assert compared == 401
    assert exact == compared, f"{exact}/{compared} bit-exact"
