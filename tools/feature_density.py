"""Feature-path ATE vs source density on REAL geometry (VERDICT r3
next #5): the round-3 garage feature row (1.80 m ATE,
EVAL_FEATURES_r03.json) was ATTRIBUTED to the 8.1k-point source cloud's
thinness (~1.2k visible points per re-raycast scan) without an
experiment isolating extractor-vs-data. This tool builds that curve:

1. densify the real garage cloud by tangent-plane surface upsampling
   (kNN-PCA normal per point; extra samples uniformly in the local
   tangent disk, radius = distance to the 5th neighbor — adds points ON
   the measured surfaces, no new geometry invented),
2. re-raycast structured VLP-16 sweeps from the same trajectory at each
   density,
3. replay the FULL feature pipeline (extract_features=true + adaptive
   plane/edge covariances — same config as eval_suite --features),
4. report ATE vs density.

Extractor exonerated = ATE drops to cm-class once visible density
reaches reference-grade; a flat curve would indict the extractor
instead. Writes FEATURE_DENSITY_r04.json at the repo root.
"""
import json
import os

import numpy as np

import _pathsetup  # noqa: F401


def load_garage_world():
    from locus_tpu.io import pcd

    import real_data_battery as bat

    d = pcd.read_pcd(bat.REFERENCE)
    world = np.stack([np.asarray(d[c], np.float32) for c in ("x", "y", "z")], 1)
    return world[np.isfinite(world).all(1)]


def densify(world: np.ndarray, factor: int, seed: int = 0,
            max_disk: float = np.inf) -> np.ndarray:
    """Tangent-plane surface upsampling: for each point, estimate the
    local plane from k=10 neighbors (PCA) and draw (factor-1) samples
    uniformly in the tangent disk whose radius is the distance to the
    5th neighbor — densifies the sampled surfaces without inventing
    geometry beyond the local planar approximation.

    `max_disk` caps the disk radius: in sparse regions the 5th-neighbor
    distance can reach tens of cm, and planar extrapolation at that
    scale THICKENS curved/edge geometry — the upsampling artifact then
    dominates the very curvature signal the experiment measures."""
    if factor <= 1:
        return world
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    tree = cKDTree(world)
    d, idx = tree.query(world, k=10)
    disk_r = np.minimum(d[:, 5], max_disk)            # local spacing scale
    nbr = world[idx]                                  # (N, 10, 3)
    mean = nbr.mean(axis=1, keepdims=True)
    cen = nbr - mean
    cov = np.einsum("nki,nkj->nij", cen, cen)
    w, v = np.linalg.eigh(cov)
    normal = v[:, :, 0]                               # smallest eigvec
    # tangent basis
    t1 = np.cross(normal, np.where(
        np.abs(normal[:, 2:3]) < 0.9,
        np.asarray([0.0, 0.0, 1.0]),
        np.asarray([1.0, 0.0, 0.0]),
    ))
    t1 /= np.linalg.norm(t1, axis=1, keepdims=True) + 1e-12
    t2 = np.cross(normal, t1)

    n = world.shape[0]
    k = factor - 1
    u = rng.random((n, k))
    theta = rng.random((n, k)) * 2 * np.pi
    r = np.sqrt(u) * disk_r[:, None]
    off = (
        (r * np.cos(theta))[..., None] * t1[:, None, :]
        + (r * np.sin(theta))[..., None] * t2[:, None, :]
    )
    extra = (world[:, None, :] + off).reshape(-1, 3).astype(np.float32)
    return np.concatenate([world, extra], axis=0)


def feature_cfg(azimuth: int = 900):
    import dataclasses

    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig

    cfg = LocusConfig(
        scan_capacity=4096,
        raw_scan_capacity=32768,
        points_to_process_in_callback=3000,
        mapper=MapperConfig(map_capacity=1 << 17, keyframe_capacity=4096),
    )
    return cfg.replace(
        filtering=FilterConfig(extract_features=True, feature_width=azimuth),
        odometry=dataclasses.replace(cfg.odometry, covariance_mode="adaptive"),
        localization=dataclasses.replace(
            cfg.localization,
            registration=dataclasses.replace(
                cfg.localization.registration, covariance_mode="adaptive"
            ),
        ),
    )


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--scans", type=int, default=40)
    ap.add_argument("--factors", nargs="*", type=int, default=[1, 2, 4, 8, 16])
    ap.add_argument("--max-disk", type=float, default=float("inf"),
                    help="cap on the tangent-disk radius [m]")
    ap.add_argument("--out", default="FEATURE_DENSITY_r04.json")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import real_data_battery as bat

    from locus_tpu.metrics import ate_rmse, rpe
    from locus_tpu.runner import run_sequence

    world0 = load_garage_world()
    cfg = feature_cfg()
    rows = []
    for f in args.factors:
        world = densify(world0, f, max_disk=args.max_disk)
        seq = bat.make_garage_sequence(
            num_scans=args.scans, structured=True, world_points=world
        )
        visible = float(seq.scan_valid.sum(axis=1).mean())
        poses, _, _ = run_sequence(seq, cfg, collect_outputs=False)
        gt = seq.gt_poses[: poses.shape[0]]
        t_rpe, r_rpe = rpe(poses, gt)
        row = {
            "density_factor": f,
            "world_points": int(world.shape[0]),
            "visible_points_per_scan": round(visible, 1),
            "ate_m": round(
                float(ate_rmse(poses[:, :3, 3], gt[:, :3, 3], align=False)), 4
            ),
            "rpe_t_m": round(t_rpe, 4),
            "rpe_r_deg": round(float(np.degrees(r_rpe)), 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    report = {
        "experiment": "garage feature-path ATE vs source density "
        "(tangent-disk surface upsampling of the real PCD; "
        "re-raycast structured sweeps; full feature pipeline)",
        "scans": args.scans,
        "max_disk_m": args.max_disk,
        "rows": rows,
    }
    out = os.path.join(os.path.dirname(__file__), "..", args.out)
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"wrote": out}))


if __name__ == "__main__":
    main()
