"""Dataset factory — the ``create_dataloader`` equivalent.

One entry point dispatching every dataset family the reference supports
(``/root/reference/permuto_sdf_py/utils/common_utils.py:410-506``):
synthetic (this framework's data-free stand-in), dtu, bmvs (same loader,
different root), multiface, custom (images + cameras.json), phenorobcp1.

PhenorobCP1 note: the reference reads that capture through its external
C++ ``DataLoaderPhenorobCP1``; the raw field-robot format is not published
with the reference. Ingestion here goes through the custom-dataset
convention (images + per-image K + cam-to-world poses in ``cameras.json``
or IDR ``cameras.npz``) — converting a PhenorobCP1 capture to it is a
metadata-only transform.
"""

from __future__ import annotations

import os

from permuto_sdf_tpu.datasets.tensor_reel import TensorReel


def create_reel(dataset: str, scene: str | None = None,
                data_root: str | None = None, low_res: bool = False,
                with_mask: bool = False, mode: str = "train",
                crop_to_bound: bool | None = None) -> TensorReel:
    """-> device-resident TensorReel for any supported dataset family.

    ``crop_to_bound`` crops every frame to the projected bounding sphere
    (equal sizes, K shifted — ``get_frames_cropped`` equivalent,
    permuto_sdf_utils.py:99-179). Default None = the reference's
    convention: on for multiface/phenorobcp1, off elsewhere."""
    if crop_to_bound is None:
        crop_to_bound = dataset in ("multiface", "phenorobcp1")

    def _maybe_crop(reel: TensorReel) -> TensorReel:
        if not crop_to_bound:
            return reel
        from permuto_sdf_tpu.datasets.tensor_reel import crop_reel_to_sphere

        return crop_reel_to_sphere(reel, radius=0.5)
    if dataset == "synthetic":
        from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

        return make_synthetic_reel(
            nr_views=24, width=100 if low_res else 200,
            height=100 if low_res else 200,
        )
    if dataset in ("dtu", "bmvs"):
        from permuto_sdf_tpu.datasets.dtu import load_dtu_scene

        scene_dir = os.path.join(data_root, scene) if scene else data_root
        return load_dtu_scene(scene_dir, low_res=low_res, with_mask=with_mask)
    if dataset == "multiface":
        from permuto_sdf_tpu.datasets.multiface import load_multiface_scene

        # reference convention: scene name IS the subject preset id
        # (common_utils.py:439)
        return _maybe_crop(load_multiface_scene(data_root, int(scene or 0),
                                                low_res=low_res, mode=mode))
    if dataset in ("custom", "phenorobcp1", "easypbr"):
        from permuto_sdf_tpu.experiments.run_custom_dataset import load_custom_scene

        scene_dir = os.path.join(data_root, scene) if scene else data_root
        return _maybe_crop(load_custom_scene(scene_dir,
                                             subsample=4 if low_res else 1))
    raise ValueError(f"unknown dataset {dataset!r} — expected synthetic | dtu "
                     f"| bmvs | multiface | custom | phenorobcp1 | easypbr")
