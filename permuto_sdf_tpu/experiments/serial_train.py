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

import jax
import jax.numpy as jnp

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


def train_one_scene_per_device(reels: dict, cfg, nr_iters: int,
                               checkpoint_path: str | None = None,
                               seed: int = 0, log_every: int = 1000):
    """Train up to ``jax.device_count()`` scenes CONCURRENTLY, one scene
    pinned to one device — throughput scale-out the single-GPU reference
    cannot express (its serial_train.py:70-96 loops scenes sequentially).

    Each scene's state (params/optimizer/grid/reel) is committed to its
    device with ``jax.device_put``; the host round-robins step dispatches,
    which are asynchronous, so all devices compute in parallel. No
    cross-device communication is involved (scenes are independent) — this
    composes with, and is the alternative to, ray-batch data parallelism
    (parallel/data_parallel.py) depending on whether you want one scene
    fast or many scenes at once.

    ``reels``: {scene_name: TensorReel}. Returns {scene_name: (params,
    grid, last_loss)}.
    """
    from permuto_sdf_tpu.train import train_permuto_sdf as tps
    from permuto_sdf_tpu.ops import occupancy_grid as og

    devices = jax.devices()
    assert len(reels) <= len(devices), (
        f"{len(reels)} scenes > {len(devices)} devices; train in groups"
    )
    optimizer = tps.make_optimizer(cfg)
    states = []
    for i, (name, reel) in enumerate(reels.items()):
        dev = devices[i]
        params = tps.init_params(
            jax.random.fold_in(jax.random.PRNGKey(seed), i), cfg,
            reel.nr_images,
        )
        states.append({
            "name": name,
            "params": jax.device_put(params, dev),
            "opt_state": jax.device_put(optimizer.init(params), dev),
            "grid": jax.device_put(og.make_occupancy_grid(cfg.grid), dev),
            "reel": jax.device_put(reel, dev),
            "inv_s": jax.device_put(jnp.asarray(jnp.exp(0.3 * 10.0)), dev),
            "loss": None,
        })

    for it in range(nr_iters):
        for i, st in enumerate(states):
            k_step, k_grid = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(seed + 1 + i), it)
            )
            if it < cfg.nr_iter_sphere_fit:
                st["params"], st["opt_state"], st["loss"] = tps.sphere_init_step(
                    st["params"], st["opt_state"], k_step, it, cfg, optimizer
                )
            else:
                it_anneal = it - cfg.nr_iter_sphere_fit
                if cfg.use_occupancy_grid and it % cfg.grid_update_every == 0:
                    st["grid"] = tps.occupancy_update(
                        st["params"], st["grid"], k_grid, it_anneal,
                        st["inv_s"], cfg,
                    )
                st["params"], st["opt_state"], st["loss"], aux = tps.train_step(
                    st["params"], st["opt_state"], st["grid"], st["reel"],
                    k_step, it, cfg, optimizer,
                )
                st["inv_s"] = aux["inv_s"]
        if it % log_every == 0 or it == nr_iters - 1:
            losses = "  ".join(
                f"{st['name']}={float(st['loss']):.5f}" for st in states
            )
            print(f"iter {it:6d}  {losses}", flush=True)

    out = {}
    for st in states:
        if checkpoint_path:
            tps._save(checkpoint_path, f"permuto_sdf_{st['name']}", nr_iters,
                      st["params"], st["grid"], opt_state=st["opt_state"],
                      cfg=cfg, last_inv_s=st["inv_s"],
                      final_iter=nr_iters - 1)
        out[st["name"]] = (st["params"], st["grid"], float(st["loss"]))
    return out


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
    parser.add_argument("--one_scene_per_device", action="store_true",
                        help="train scenes concurrently, one per device, in "
                             "groups of jax.device_count()")
    args = parser.parse_args()

    from permuto_sdf_tpu.datasets.dtu import load_dtu_scene
    from permuto_sdf_tpu.train import train_permuto_sdf as tps

    scenes = args.scenes or (DTU_SCENES if args.dataset == "dtu" else BMVS_SCENES)
    scenes = [s for s in scenes
              if os.path.isdir(os.path.join(args.data_root, s))
              or print(f"skip {s}: not found under {args.data_root}")]
    cfg = tps.PermutoSDFTrainConfig(with_mask=args.with_mask)

    if args.one_scene_per_device:
        group = max(1, jax.device_count())
        for i in range(0, len(scenes), group):
            batch = scenes[i : i + group]
            print(f"=== concurrently training {batch} ===")
            reels = {
                s: load_dtu_scene(os.path.join(args.data_root, s),
                                  low_res=args.low_res,
                                  with_mask=args.with_mask)
                for s in batch
            }
            train_one_scene_per_device(
                reels, cfg, nr_iters=args.nr_iters or cfg.iter_finish_training,
                checkpoint_path=args.checkpoint_path,
            )
        return

    for scene in scenes:
        print(f"=== training {scene} ===")
        reel = load_dtu_scene(os.path.join(args.data_root, scene),
                              low_res=args.low_res, with_mask=args.with_mask)
        tps.train(
            reel, cfg, nr_iters=args.nr_iters,
            checkpoint_path=args.checkpoint_path,
            experiment_name=f"permuto_sdf_{scene}",
        )


if __name__ == "__main__":
    main()
