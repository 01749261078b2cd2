"""Offline data preparation — the reference's three notebooks as a module.

The reference prepares its training pickles in Jupyter notebooks
(SURVEY.md §2.6):

- ``notebooks/data_filtering.ipynb``: log-transform raw GEANT4 images,
  compute per-event photon sums, filter by photon-sum range;
- ``notebooks/calculating_diversity_for_data.ipynb``: group events with
  identical 9-dim conditioning, compute the per-group pixel-stddev "diversity"
  target for SDI-GAN;
- ``notebooks/calculate_and_analysis_of_max_coordinates.ipynb``: per-image
  argmax coordinates for the auxiliary regressor.

Here the same capabilities are plain functions plus a CLI
(``python -m zdcsim.data.prep``) so the full raw→training pipeline is
reproducible and testable.

Deliberate divergence: the reference log-transforms proton images with
``log`` but inverts with ``expm1`` everywhere (data_filtering.ipynb cell 7 vs
moe.py:646) — an inconsistency. zdcsim uses ``log1p`` for both detectors so
``expm1`` is the exact inverse.
"""

from __future__ import annotations

import argparse
import logging
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

COND_COLUMNS = ("Energy", "Vx", "Vy", "Vz", "Px", "Py", "Pz", "mass", "charge")

log = logging.getLogger(__name__)


def photon_sums(images_linear: np.ndarray) -> np.ndarray:
    """Per-event photon sum over all pixels of linear-space images [N,H,W].

    Uses the native C++ kernel when available (zdcsim/native)."""
    from zdcsim import native

    return native.photon_sums(np.asarray(images_linear, np.float32))


def log_transform(images_linear: np.ndarray) -> np.ndarray:
    """Linear photon counts -> log1p space (the training representation)."""
    return np.log1p(images_linear.astype(np.float32))


def filter_photon_sum(
    sums: np.ndarray,
    min_sum: Optional[float] = None,
    max_sum: Optional[float] = None,
) -> np.ndarray:
    """Boolean mask of events inside [min_sum, max_sum]
    (data_filtering.ipynb ``filter_photon_sum``; inclusive bounds match the
    runtime filter at data_transformations.py:48-63)."""
    mask = np.ones(sums.shape[0], dtype=bool)
    if min_sum is not None:
        mask &= sums >= min_sum
    if max_sum is not None:
        mask &= sums <= max_sum
    return mask


def max_coordinates(images: np.ndarray) -> np.ndarray:
    """Argmax pixel coordinates per image: [N, 2] of (max_x=row, max_y=col).

    Matches the reference's ``get_max_value_image_coordinates``
    (calculate_and_analysis_of_max_coordinates.ipynb): for proton 56x30 the
    coordinate maxima are (55, 29) so x indexes the first (H) axis.
    Native C++ kernel when available.
    """
    from zdcsim import native

    n, h, w = images.shape[0], images.shape[-2], images.shape[-1]
    return native.max_coords(np.asarray(images, np.float32).reshape(n, h, w))


def group_by_condition(cond: np.ndarray) -> np.ndarray:
    """Group id per event; events with bit-identical conditioning share an id.

    The reference builds a string key ``Energy|Vx|...|charge`` and merges
    (data_transformations.py:147-158 / diversity notebook cells 16-28); here
    the grouping is a lexicographic unique over the raw float rows.
    """
    _, group_ids = np.unique(
        np.ascontiguousarray(np.asarray(cond, np.float64)),
        axis=0,
        return_inverse=True,
    )
    return group_ids.astype(np.int64)


def diversity_std(images_log: np.ndarray, group_ids: np.ndarray) -> np.ndarray:
    """SDI-GAN per-event diversity target.

    Per group of same-condition events: per-pixel stddev across the group,
    summed over pixels; every member gets the group value; finally
    max-normalized over the dataset (calculating_diversity_for_data.ipynb).
    Expects LOG-space images: the reference applies ``np.log`` in
    data_filtering.ipynb before the diversity notebook takes ``np.std`` —
    linear-space std would concentrate near 0 after max-normalization and
    distort the SDI-GAN target distribution. Groups of size 1 get std 0.
    Native C++ kernel (Welford per pixel lane, threaded over groups) when
    available.
    """
    from zdcsim import native

    out = native.group_pixel_std(np.asarray(images_log, np.float32), group_ids)
    peak = out.max() if out.size else 0.0
    if peak > 0:
        out = out / peak
    return out.astype(np.float32)


def pair_same_condition(group_ids: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """For each event, the index of a random event with identical conditioning.

    The SDI-GAN "paired sample" (data_transformations.py:147-158): the
    reference merges against a shuffled copy and takes the first match, which
    may be the event itself; singleton groups always pair with themselves.
    """
    n = group_ids.shape[0]
    order = np.argsort(group_ids, kind="stable")
    sorted_ids = group_ids[order]
    boundaries = np.flatnonzero(np.diff(sorted_ids)) + 1
    pair = np.empty(n, dtype=np.int64)
    for seg in np.split(order, boundaries):
        pair[seg] = rng.permutation(seg)
    return pair


@dataclass
class PreparedDataset:
    """Training-ready arrays in the reference pickle layout.

    images: [N, H, W] log1p-space; cond: dict of the 9 kinematic columns plus
    ``{zdc}_photon_sum``, ``std``, ``group_number``; positions: [N, 2].
    """

    images: np.ndarray
    cond: Dict[str, np.ndarray]
    positions: np.ndarray
    zdc_type: str

    @property
    def n_events(self) -> int:
        return self.images.shape[0]

    def cond_matrix(self) -> np.ndarray:
        """[N, 9] matrix of the conditioning columns in canonical order."""
        return np.stack([self.cond[c] for c in COND_COLUMNS], axis=1).astype(np.float32)


def prepare_dataset(
    raw_images: np.ndarray,
    cond: Dict[str, np.ndarray],
    zdc_type: str,
    min_photon_sum: Optional[float] = None,
    max_photon_sum: Optional[float] = None,
) -> PreparedDataset:
    """Full raw→training prep: filter, log-transform, diversity std, coords.

    ``raw_images`` are linear-space GEANT4 photon counts [N, H, W]; ``cond``
    maps each of the 9 kinematic columns to [N] arrays.
    """
    sums = photon_sums(raw_images)
    mask = filter_photon_sum(sums, min_photon_sum, max_photon_sum)
    raw_images = raw_images[mask]
    sums = sums[mask]
    cond = {k: np.asarray(v)[mask] for k, v in cond.items()}

    cond_mat = np.stack([cond[c] for c in COND_COLUMNS], axis=1)
    group_ids = group_by_condition(cond_mat)
    # Diversity std is taken in LOG space (reference notebook order: log
    # first, then group std); max coords are transform-invariant (argmax).
    images_log = log_transform(raw_images)
    std = diversity_std(images_log, group_ids)
    positions = max_coordinates(raw_images)

    out_cond = dict(cond)
    out_cond[f"{zdc_type}_photon_sum"] = sums.astype(np.float32)
    out_cond["std" if zdc_type == "neutron" else "std_proton"] = std
    out_cond["group_number" if zdc_type == "neutron" else "group_number_proton"] = group_ids
    if zdc_type == "proton":
        # The reference's proton pickles carry a precomputed expert label
        # (data_transformations.py:163); unused downstream, kept for parity.
        out_cond["expert_number"] = np.zeros(images_log.shape[0], dtype=np.int64)

    log.info(
        "prepare_dataset: %d/%d events kept (photon-sum in [%s, %s])",
        images_log.shape[0], mask.shape[0], min_photon_sum, max_photon_sum,
    )
    return PreparedDataset(images=images_log, cond=out_cond, positions=positions, zdc_type=zdc_type)


def save_prepared(ds: PreparedDataset, images_path: str, cond_path: str, positions_path: str) -> None:
    """Write the three training pickles in the reference's on-disk layout
    (images ndarray pickle; cond and positions DataFrame pickles)."""
    import pandas as pd

    pd.to_pickle(ds.images, images_path)
    pd.to_pickle(pd.DataFrame(ds.cond), cond_path)
    pd.to_pickle(
        pd.DataFrame({"max_x": ds.positions[:, 0], "max_y": ds.positions[:, 1]}),
        positions_path,
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="zdcsim offline data prep (notebook-equivalent)")
    parser.add_argument("--raw-images", required=True, help="pickle of linear-space [N,H,W] images")
    parser.add_argument("--raw-cond", required=True, help="pickle of conditioning DataFrame")
    parser.add_argument("--zdc-type", choices=("proton", "neutron"), required=True)
    parser.add_argument("--min-photon-sum", type=float, default=None)
    parser.add_argument("--max-photon-sum", type=float, default=None)
    parser.add_argument("--out-images", required=True)
    parser.add_argument("--out-cond", required=True)
    parser.add_argument("--out-positions", required=True)
    parser.add_argument(
        "--report", action="store_true",
        help="write analysis_report.txt (coordinate/photon-sum/correlation "
        "analyses — the reference notebooks' report) next to --out-images",
    )
    args = parser.parse_args(argv)

    import pandas as pd

    raw_images = np.asarray(pd.read_pickle(args.raw_images))
    raw_cond_df = pd.read_pickle(args.raw_cond)
    cond = {c: raw_cond_df[c].to_numpy() for c in COND_COLUMNS}
    ds = prepare_dataset(raw_images, cond, args.zdc_type, args.min_photon_sum, args.max_photon_sum)
    save_prepared(ds, args.out_images, args.out_cond, args.out_positions)
    if args.report:
        import os

        from zdcsim.evals.report import dataset_analysis_report

        text = dataset_analysis_report(
            np.expm1(ds.images),
            photon_sums=np.asarray(ds.cond[f"{args.zdc_type}_photon_sum"]),
            n_before_filter=raw_images.shape[0],
            title=f"zdcsim {args.zdc_type} dataset analysis",
        )
        path = os.path.join(os.path.dirname(os.path.abspath(args.out_images)),
                            "analysis_report.txt")
        with open(path, "w") as f:
            f.write(text)
        log.info("Analysis report written to %s", path)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
