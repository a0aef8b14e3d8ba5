"""Capture a jax.profiler trace of the bench train step on TPU and print
per-op time attribution.

Why: XLA's ``compiled.cost_analysis()`` counts a ``lax.scan`` body ONCE,
not per trip — with the remat sample-chunking (4+8 scan trips x recompute)
the bench's 157 GFLOP/step figure may undercount the real FLOPs by ~6x,
which would flip the "compute-structure-bound" conclusion. This script gets
ground truth: an xplane trace parsed with xprof's converter
(``hlo_stats`` / ``op_profile``), aggregated into a category breakdown.

Usage:  python scripts/profile_step.py [--outdir /tmp/nerf_trace]
Writes: <outdir>/hlo_stats.json + prints a top-op table and category summary.
"""
import argparse
import glob
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/nerf_trace")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--workload", default="nerf", choices=["nerf", "nerfpp"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    # PREFLIGHT (CLAUDE.md axon-wedge mitigation): first tiny op proves the
    # session is healthy before we invest in the big compile.
    x = jnp.arange(4.0) @ jnp.ones((4,))
    jax.block_until_ready(x)
    print("[preflight] ok, backend =", jax.default_backend(), flush=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if args.workload == "nerf":
        state, step, batch = _nerf_workload()
    else:
        state, step, batch = _nerfpp_workload()
    key = jax.random.key(0)
    compiled = step.lower(state, batch, key).compile()
    state, _ = compiled(state, batch, key)
    jax.block_until_ready(state.params)
    print("[profile] compiled + warm", flush=True)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, _ = compiled(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"[profile] untraced step: {dt*1e3:.2f} ms", flush=True)

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for i in range(args.steps):
            state, _ = compiled(state, batch, jax.random.fold_in(key, i))
        jax.block_until_ready(state.params)
    print("[profile] trace captured", flush=True)

    report(args.outdir, args.steps, dt)


def _nerf_workload():
    """The bench.py headline step: fern shapes (1024 rays, 64+64, 8x256
    MLP, full generic camera, joint backward). Returns (state, jitted
    step, batch) so `.lower(...).compile()` profiles exactly what the
    bench times."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import TrainConfig, create_train_state, make_train_step

    model_cfg, render_cfg, params = _flagship()
    train_cfg = TrainConfig(lr_init=5e-4, lr_decay_steps=250e3, near=2.0, far=6.0)
    tx = make_optimizer(5e-4, 250e3, weight_decay=0.1, params_example=params)
    state = create_train_state(params, tx)
    step = make_train_step(model_cfg, render_cfg, train_cfg, Curriculum(), tx)
    rng = np.random.RandomState(0)
    n_rand = 1024
    batch = {
        "px": jnp.asarray(rng.randint(0, 1008, n_rand).astype(np.float32)),
        "py": jnp.asarray(rng.randint(0, 756, n_rand).astype(np.float32)),
        "img_idx": jnp.asarray(rng.randint(0, 8, n_rand)),
        "target": jnp.asarray(rng.rand(n_rand, 3).astype(np.float32)),
    }
    return state, step, batch


def _nerfpp_workload(n_rand: int = 2048):
    """bench.py's NeRF++ T&T workload (N_rand=2048, cascade 64,64, full
    camera)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scnerf_tpu.camera import CameraConfig, OPENCV, init_camera
    from scnerf_tpu.fields.nerfpp import NerfPPConfig, init_nerfpp_net
    from scnerf_tpu.geometry import axis_angle_to_rotation, embed_rotation_44
    from scnerf_tpu.render.nerfpp_renderer import NerfPPRenderConfig
    from scnerf_tpu.train.curriculum import Curriculum
    from scnerf_tpu.train.nerfpp_step import NerfPPTrainConfig, make_nerfpp_train_step
    from scnerf_tpu.train.optim import make_optimizer
    from scnerf_tpu.train.step import create_train_state

    H, W = 546, 980
    rng = np.random.RandomState(3)
    K = np.array([[580.0, 0, W / 2, 0], [0, 580.0, H / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    ax = rng.randn(12, 3)
    ax /= np.linalg.norm(ax, axis=1, keepdims=True)
    E = np.array(embed_rotation_44(axis_angle_to_rotation(
        jnp.asarray(ax), jnp.asarray(rng.rand(12) * 0.3))))
    E[:, :3, 3] = rng.randn(12, 3) * 0.2
    cam = init_camera(K, E, CameraConfig(H=H, W=W, convention=OPENCV,
                                         pixel_offset=0.5))
    pcfg = NerfPPConfig()
    prcfg = NerfPPRenderConfig(cascade_samples=(64, 64))
    key = jax.random.key(7)
    params = {
        "levels": [init_nerfpp_net(jax.random.fold_in(key, m), pcfg, n_images=12)
                   for m in range(2)],
        "camera": cam,
    }
    tx = make_optimizer(5e-4, 750e3, params_example=params)
    state = create_train_state(params, tx)
    step = make_nerfpp_train_step(pcfg, prcfg, NerfPPTrainConfig(), Curriculum(), tx)
    batch = {
        "px": jnp.asarray(rng.randint(0, W, n_rand).astype(np.float32)),
        "py": jnp.asarray(rng.randint(0, H, n_rand).astype(np.float32)),
        "img_idx": jnp.asarray(0),
        "target": jnp.asarray(rng.rand(n_rand, 3).astype(np.float32)),
        "min_depth": jnp.full((n_rand,), 1e-4),
    }
    return state, step, batch


def report(outdir: str, n_steps: int, wall_dt: float):
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("[profile] no xplane.pb found under", outdir)
        return
    xplane = paths[-1]
    print("[profile] parsing", xplane, flush=True)
    from xprof.convert import raw_to_tool_data as rtd

    for tool in ("hlo_stats", "op_profile", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([xplane], tool, {})
            out = os.path.join(outdir, tool + ".json")
            if isinstance(data, bytes):
                data = data.decode("utf-8", "replace")
            with open(out, "w") as f:
                f.write(data if isinstance(data, str) else json.dumps(data))
            print(f"[profile] wrote {out} ({len(data)} bytes)", flush=True)
        except Exception as e:
            print(f"[profile] {tool} failed: {type(e).__name__}: {e}", flush=True)

    summarize_hlo_stats(os.path.join(outdir, "hlo_stats.json"), n_steps, wall_dt)


def summarize_hlo_stats(path: str, n_steps: int, wall_dt: float):
    if not os.path.exists(path):
        return
    raw = open(path).read()
    try:
        tbl = json.loads(raw)
    except json.JSONDecodeError:
        # gviz csv fallback
        print(raw[:2000])
        return
    # gviz DataTable: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
    if isinstance(tbl, dict) and "rows" in tbl:
        cols = [c.get("label") or c.get("id") for c in tbl["cols"]]
        rows = [[(cell or {}).get("v") for cell in r["c"]] for r in tbl["rows"]]
    else:
        print("[profile] unrecognized hlo_stats shape:", str(tbl)[:500])
        return
    print("[profile] hlo_stats columns:", cols, flush=True)
    with open(path + ".cols", "w") as f:
        json.dump(cols, f)
    # Find the self-time column and a name/category column.
    def find(*cands):
        for cand in cands:
            for i, c in enumerate(cols):
                if c and cand in c.lower():
                    return i
        return None

    # Use SELF time: a `while` op's total time includes its body, whose
    # fusions are also listed as rows — totals would double-count.
    i_time = find("total self time (us)", "total time (us)", "total time")
    i_cat = find("hlo op category", "category")
    i_name = find("hlo op name", "hlo_op_name", "op name")
    i_occ = find("#occurrences", "occurrences", "count")
    if i_time is None:
        print("[profile] no time column; cols =", cols)
        return
    total = sum(float(r[i_time] or 0) for r in rows)
    print(f"\n== HLO time by category (device total {total:.0f} us over "
          f"{n_steps} steps -> {total/n_steps:.0f} us/step; wall "
          f"{wall_dt*1e6:.0f} us/step) ==")
    by_cat = {}
    for r in rows:
        cat = r[i_cat] if i_cat is not None else "?"
        by_cat[cat] = by_cat.get(cat, 0.0) + float(r[i_time] or 0)
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:30s} {t/n_steps:9.1f} us/step  {100*t/total:5.1f}%")
    # Ground-truth roofline attribution: xprof's per-op "Bound by" verdict,
    # plus measured FLOPs/bytes integrated over SELF time — this counts every
    # scan trip and remat recompute, unlike compiled.cost_analysis() which
    # counts a scan body once.
    i_bound = find("bound by")
    i_gflops = find("model gflop/s")
    i_hbm = find("hbm bw")
    i_membw = find("measured memory bw")
    if i_bound is not None:
        by_bound = {}
        for r in rows:
            b = r[i_bound] or "?"
            by_bound[b] = by_bound.get(b, 0.0) + float(r[i_time] or 0)
        print("\n== HLO time by xprof 'Bound by' verdict ==")
        for b, t in sorted(by_bound.items(), key=lambda kv: -kv[1]):
            print(f"  {b:30s} {t/n_steps:9.1f} us/step  {100*t/total:5.1f}%")
    if i_gflops is not None:
        tot_flops = sum(
            float(r[i_gflops] or 0) * 1e9 * float(r[i_time] or 0) * 1e-6
            for r in rows)
        tot_hbm = sum(
            float(r[i_hbm] or 0) * (1 << 30) * float(r[i_time] or 0) * 1e-6
            for r in rows) if i_hbm is not None else 0.0
        tot_mem = sum(
            float(r[i_membw] or 0) * (1 << 30) * float(r[i_time] or 0) * 1e-6
            for r in rows) if i_membw is not None else 0.0
        print(f"\n== measured totals (self-time-integrated, incl. remat) ==")
        print(f"  FLOPs/step: {tot_flops/n_steps/1e9:.1f} G")
        print(f"  HBM bytes/step: {tot_hbm/n_steps/1e9:.2f} GB")
        print(f"  all-memory bytes/step: {tot_mem/n_steps/1e9:.2f} GB")
        if total:
            dev_s_per_step = total * 1e-6 / n_steps
            print(f"  achieved: {tot_flops/n_steps/dev_s_per_step/1e12:.2f} TFLOP/s, "
                  f"HBM {tot_hbm/n_steps/dev_s_per_step/1e9:.0f} GB/s "
                  f"over {dev_s_per_step*1e3:.2f} ms device time")
    print("\n== top 40 HLO ops by total time ==")
    rows.sort(key=lambda r: -float(r[i_time] or 0))
    for r in rows[:40]:
        nm = (r[i_name] if i_name is not None else "?") or "?"
        occ = r[i_occ] if i_occ is not None else "?"
        cat = r[i_cat] if i_cat is not None else "?"
        print(f"  {float(r[i_time])/n_steps:9.1f} us/step  x{occ:>5}  "
              f"[{cat}] {nm[:110]}")


if __name__ == "__main__":
    if "--report-only" in sys.argv:
        sys.argv.remove("--report-only")
        a = argparse.ArgumentParser()
        a.add_argument("--outdir", default="/tmp/nerf_trace")
        a.add_argument("--steps", type=int, default=20)
        ns, _ = a.parse_known_args()
        report(ns.outdir, ns.steps, 0.0)
    else:
        main()
