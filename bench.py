"""Benchmarks for the tracked BASELINE.md metrics.

Headline (printed LAST, the line the driver records): full-frame PCA-ADI
reduction of a 1000x512x512 cube — north-star target < 1 s on one TPU
v5e (BASELINE.json). The whole reduction — prepare -> SVD (eigen/Gram on
the MXU) -> project/subtract -> FFT 3-shear derotation of all frames ->
median collapse — runs as one jitted XLA program.

Also emitted (one JSON line each, before the headline):
  - pca_adi in the reference-exact 'fft' mode (4x-padded flux-preserving)
  - cube_derotate throughput [frames/s] in both rotation modes
  - snrmap throughput [px/s] (polar device engine)
  - bad-pixel correction throughput [frames/s]
  - out-of-core pca_incremental [frames/s], f32 and bf16 wire
  - NEGFC MCMC throughput [walker-lnprob evals/s]
  - batched-vs-serial speedups for throughput() and completeness_curve()
    at small shapes [x_vs_serial]
  - invprob wall times [seconds]: andromeda / FMMF-KLIP / FastPACO at
    the golden-snapshot configs (vs same-host reference, nproc=1)
  - at-scale end-to-end contrast_curve and pca_annular wall times
    [seconds] (vs same-host reference measurements documented inline)

Every line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
vs_baseline = target/measured for times (>1 beats target), measured
rate otherwise normalized per BASELINE.md where a target exists.

Budget guard (VERDICT r4 #1): legs run cheap-to-expensive and each leg
declares a conservative steady-state cost estimate; once the cumulative
wall clock plus the next leg's estimate would cross BENCH_BUDGET
seconds (default 2700), the remaining legs emit an explicit
{"metric": ..., "skipped": true, "reason": ...} line instead of dying
to the driver's timeout. The headline leg is exempt — it always runs
last so the driver's parsed line exists. Progress markers go to stderr
so a truncated run is diagnosable.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_FRAMES = int(os.environ.get("BENCH_FRAMES", 1000))
SIZE = int(os.environ.get("BENCH_SIZE", 512))
NCOMP = int(os.environ.get("BENCH_NCOMP", 10))
REPS = int(os.environ.get("BENCH_REPS", 3))
ROT_MODE = os.environ.get("BENCH_ROT", "fft-small")
FULL = os.environ.get("BENCH_FULL", "1") != "0"
BUDGET = float(os.environ.get("BENCH_BUDGET", 2700))

_T0 = time.monotonic()


def _elapsed():
    return time.monotonic() - _T0


def _time(fn, reps=REPS):
    import jax.numpy as jnp

    def once():
        out = fn()
        return float(jnp.sum(out))  # force materialization (remote backend)

    try:
        first = once()
    except Exception:
        # a failing device call can crash the remote TPU worker; it
        # self-heals in ~1-2 min — wait out the window and retry once
        time.sleep(130)
        first = once()
    assert np.isfinite(first)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        once()
        times.append(time.perf_counter() - t0)
    return min(times)


def _time_once(fn):
    """One timed run (for the expensive at-scale legs, where a warmup
    pass would double the bench budget). The persistent XLA compile
    cache (.xla_cache, populated by earlier runs on this host) keeps
    compile time out of steady-state driver runs."""
    import jax.numpy as jnp

    t0 = time.perf_counter()
    out = fn()
    val = float(jnp.sum(out))   # force materialization (remote backend)
    dt = time.perf_counter() - t0
    assert np.isfinite(val)
    return dt


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": round(value, 4),
                      "unit": unit, "vs_baseline": round(vs_baseline, 3)}),
          flush=True)


def _leg(metric, cost_est, runner):
    """Run one bench leg under the cumulative budget guard.

    runner() -> (value, unit, vs_baseline), or a list of such tuples
    prefixed with their metric name for multi-metric legs. When the
    elapsed time plus ``cost_est`` (a conservative steady-state
    estimate, seconds) would cross BENCH_BUDGET, emit an explicit skip
    line instead (VERDICT r4 #1: no silently missing entries)."""
    if _elapsed() + cost_est > BUDGET:
        print(json.dumps({
            "metric": metric, "skipped": True,
            "reason": f"budget: {_elapsed():.0f}s elapsed + "
                      f"~{cost_est:.0f}s est > {BUDGET:.0f}s"}),
            flush=True)
        return
    print(f"# leg {metric} start t={_elapsed():.0f}s", file=sys.stderr,
          flush=True)
    res = runner()
    if isinstance(res, list):
        for m, value, unit, vs in res:
            _emit(m, value, unit, vs)
    else:
        value, unit, vs = res
        _emit(metric, value, unit, vs)
    print(f"# leg {metric} done t={_elapsed():.0f}s", file=sys.stderr,
          flush=True)


def _probe_devices(timeout_s=120, budget_s=None):
    """Resolve jax.devices(), surviving a down-but-healing TPU tunnel.

    A dead remote tunnel hangs device discovery forever — and a hung
    in-process probe keeps holding JAX's backend-init lock, so the probe
    runs in a THROWAWAY SUBPROCESS per attempt (killable on timeout).
    Attempts repeat within BENCH_PROBE_BUDGET seconds (default 900) so a
    worker mid-self-heal still gets benched; only once a subprocess sees
    the backend do we initialize it in this process."""
    import subprocess

    if budget_s is None:
        budget_s = float(os.environ.get("BENCH_PROBE_BUDGET", 900))
    deadline = time.monotonic() + budget_s
    last_err = None
    while True:
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=timeout_s, check=True, capture_output=True)
            # The tunnel can flap between the subprocess probe and the
            # in-process init, so bound the in-process call too. A hung
            # thread keeps holding the backend-init lock, so on timeout
            # the only safe recovery is a hard exit (the driver retries).
            import concurrent.futures

            def _init():
                import jax
                return jax.devices()

            with concurrent.futures.ThreadPoolExecutor(1) as ex:
                try:
                    return ex.submit(_init).result(timeout=timeout_s + 60)
                except concurrent.futures.TimeoutError:
                    print("# in-process backend init hung after the probe "
                          "succeeded — tunnel flapping; aborting",
                          file=sys.stderr, flush=True)
                    os._exit(3)
        except subprocess.TimeoutExpired:
            last_err = f"probe subprocess unresponsive after {timeout_s}s"
        except subprocess.CalledProcessError as e:
            last_err = (e.stderr or b"").decode(errors="replace")[-400:]
        if time.monotonic() >= deadline:
            break
        print(f"# device discovery failed ({last_err}); retrying until "
              "the probe budget runs out", file=sys.stderr, flush=True)
        time.sleep(60)
    raise RuntimeError(
        f"no responsive TPU backend within {budget_s:.0f}s — the tunnel "
        f"is down (outlasted the worker's 1-2 min self-heal); last error: "
        f"{last_err}")


def main():
    import jax.numpy as jnp

    from vip_tpu.ops.pipeline import derotate_collapse, pca_adi_pipeline

    dev = _probe_devices()[0]
    import jax

    # Persistent compilation cache: keeps compile time out of
    # steady-state driver runs (populated during the round on this
    # host). No-op if the backend doesn't support serialized
    # executables.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    rng = np.random.default_rng(0)
    cube = rng.standard_normal((N_FRAMES, SIZE, SIZE)).astype(np.float32)
    angles = np.linspace(0.0, 80.0, N_FRAMES).astype(np.float32)
    cube_d = jax.device_put(jnp.asarray(cube), dev)
    ang_d = jax.device_put(jnp.asarray(angles), dev)

    chunk_exact = int(os.environ.get("BENCH_CHUNK", 50))
    chunk_small = int(os.environ.get("BENCH_CHUNK_SMALL", 125))

    def pca_run(rot_mode):
        chunk = chunk_exact if rot_mode == "fft" else chunk_small
        return lambda: pca_adi_pipeline(
            cube_d, ang_d, ncomp=NCOMP, method="eigen", collapse="median",
            chunk=chunk, rot_mode=rot_mode, interpolation="bicubic")

    if FULL:
        # --- exact-mode PCA-ADI (reference 4x-padded rotation) ---
        def leg_exact():
            t = _time(pca_run("fft"))
            return t, "seconds", 1.0 / t

        _leg(f"pca_adi_fullfr_{N_FRAMES}x{SIZE}x{SIZE}_ncomp{NCOMP}_fft",
             90, leg_exact)

        # --- cube_derotate throughput, both modes ---
        for mode, chunk in (("fft", chunk_exact), ("fft-small",
                                                   chunk_small)):
            def leg_rot(mode=mode, chunk=chunk):
                t = _time(lambda: derotate_collapse(
                    cube_d, ang_d, collapse="median", chunk=chunk,
                    rot_mode=mode))
                return N_FRAMES / t, "frames/s", N_FRAMES / t / 1000.0

            _leg(f"cube_derotate_{N_FRAMES}x{SIZE}x{SIZE}_{mode}", 60,
                 leg_rot)

        # --- snrmap throughput (polar device engine) ---
        def leg_snr():
            from vip_tpu.ops.apertures import snrmap_polar_engine

            frame_d = jax.device_put(jnp.asarray(cube[0]), dev)
            fn_snr = jax.jit(lambda f: snrmap_polar_engine(f, 4.0))
            t = _time(lambda: fn_snr(frame_d))
            px = SIZE * SIZE
            return px / t, "px/s", px / t / 1e6

        _leg(f"snrmap_{SIZE}x{SIZE}", 45, leg_snr)

        # --- bad-pixel correction throughput (device median filter +
        # neighbour sigma clip; replaces the reference's numba kernels,
        # reference README.rst:186 "~50x over numpy") ---
        def leg_badpix():
            from vip_tpu.ops.badpix import (clip_neighbor_device,
                                            median_filter_device)

            bp_chunk = 25

            @jax.jit
            def _badpix_detect(c):
                mean_fr = jnp.mean(c, axis=0)
                return clip_neighbor_device(mean_fr,
                                            jnp.ones((SIZE, SIZE), bool),
                                            3.0, 3.0, 2, 2)

            @jax.jit
            def _badpix_fix_chunk(blk, bpm):
                sm = median_filter_device(blk, 5)
                return jnp.where(bpm[None], sm, blk)

            def badpix_run():
                bpm = _badpix_detect(cube_d)
                outs = [_badpix_fix_chunk(cube_d[i:i + bp_chunk], bpm)
                        for i in range(0, N_FRAMES, bp_chunk)]
                return outs[-1]

            # vs_baseline: reference numba rate estimate = scipy serial
            # on this host (2.2 frames/s at 512^2, size=5) x the
            # reference's claimed "~50x over numpy" (README.rst:186)
            # = ~110 frames/s
            t = _time(badpix_run)
            return N_FRAMES / t, "frames/s", N_FRAMES / t / 110.0

        _leg(f"badpix_isolated_{N_FRAMES}x{SIZE}x{SIZE}", 60, leg_badpix)

        # --- NEGFC MCMC walker throughput ---
        def leg_mcmc():
            from vip_tpu.ops.negfc_model import make_batched_lnprob

            # per-walker forward model rotates the whole cube on a
            # ~4x-padded canvas; size the walker batch to HBM (v5e: 16 GB)
            n_mc, sz_mc, nw = 50, 64, 16
            cube_mc = cube[:n_mc, :sz_mc, :sz_mc].astype(float)
            ang_mc = angles[:n_mc].astype(float)
            yy, xx = np.mgrid[:13, :13]
            psfn = np.exp(-((yy - 6.0) ** 2 + (xx - 6.0) ** 2)
                          / (2 * (4 / 2.355) ** 2))
            bounds = [(10.0, 30.0), (10.0, 80.0), (0.1, 100.0)]
            lnp = make_batched_lnprob(cube_mc, ang_mc, psfn, 5, 4, 20.0,
                                      45.0, 2.0, 4.0, np.zeros(1), 1.0,
                                      bounds)
            walkers = jnp.asarray(np.column_stack([
                np.random.uniform(15, 25, nw),
                np.random.uniform(30, 60, nw),
                np.random.uniform(1, 50, nw)]))
            t = _time(lambda: lnp(walkers))
            return nw / t, "walker_evals/s", nw / t / 100.0

        _leg("negfc_mcmc_lnprob_50x64x64_16walkers", 60, leg_mcmc)

        # --- out-of-core streaming PCA (pass-1 device merge-SVD with
        # host prefetch + pass-2 streamed project/derotate/collapse);
        # batches sized to 1/8 of the cube so the full cube is never
        # device-resident ---
        from vip_tpu.psfsub.utils_pca import pca_incremental

        inc_batch = max(8, N_FRAMES // 8)

        def leg_inc(wire=None):
            def inc_run():
                return jnp.asarray(pca_incremental(
                    cube, angles, batch=inc_batch, ncomp=NCOMP,
                    verbose=False, wire_dtype=wire))

            # vs_baseline: the reference engine is sklearn
            # IncrementalPCA partial_fit + transform/inverse_transform
            # per batch (reference utils_pca.py:431-614). Measured on
            # this host 2026-08-18 at the same 512x512 / batch=125 /
            # ncomp=10 shape: 2.07 frames/s BEFORE its per-batch CPU
            # FFT derotation (which our timing includes), so the ratio
            # is conservative.
            # min-of-2 timed runs after the warmup (VERDICT r4 #6): the
            # tunnel's own throughput warms 33->44 MB/s across runs and
            # this leg is link-bound, so a single sample under-reads.
            t = _time(inc_run, reps=2)
            return N_FRAMES / t, "frames/s", N_FRAMES / t / 2.07

        _leg(f"pca_incremental_{N_FRAMES}x{SIZE}x{SIZE}_batch{inc_batch}",
             180, leg_inc)

        # --- the same, streaming a bf16 WIRE format: the workload is
        # bound by the host->device link (33-44 MB/s on the tunnel;
        # docs/PROFILING.md out-of-core table), so halving the bytes
        # halves the wall time; quantization ~4e-3 of the cube's
        # dynamic range (utils_pca.pca_incremental docstring caveat)
        _leg(f"pca_incremental_{N_FRAMES}x{SIZE}x{SIZE}_batch{inc_batch}"
             "_bf16wire", 120, lambda: leg_inc(wire="bfloat16"))

        # --- batched-injection contrast throughput (SURVEY §3.3): all
        # nbranch x fc_rad_sep injected cubes through ONE vmapped PCA
        # program vs the serial per-pattern loop, at a small shape that
        # fits the budget. HONESTY NOTE (r5): the serial path's stages
        # are now themselves device-resident, so at this toy shape the
        # two run at parity (~0.7-1.1x run-to-run) — the batching claim
        # that matters is carried by the AT-SCALE contrast_curve leg
        # below (one device-injected batched program, ~14x the
        # reference's serial-rerun pattern). Disable with
        # BENCH_THROUGHPUT=0.
        if os.environ.get("BENCH_THROUGHPUT", "1") == "1":
            def leg_tp():
                from vip_tpu.metrics.contrcurve import throughput
                from vip_tpu.psfsub import pca as _pca

                n_tc, sz_tc = 40, 100
                cube_tc = cube[:n_tc, :sz_tc, :sz_tc].astype(float)
                ang_tc = angles[:n_tc].astype(float)
                yy, xx = np.mgrid[:19, :19]
                psf_tc = np.exp(-((yy - 9.0) ** 2 + (xx - 9.0) ** 2)
                                / (2 * (4 / 2.355) ** 2))

                def tp_run(batched):
                    return throughput(cube_tc, ang_tc, psf_tc, 4.0, _pca,
                                      nbranch=2, ncomp=5, verbose=False,
                                      batch_patterns=batched)

                t0 = time.perf_counter(); tp_run(True)
                t_b = time.perf_counter() - t0          # incl. compile
                t0 = time.perf_counter(); tp_run(True)
                t_b = min(t_b, time.perf_counter() - t0)
                tp_run(False)         # warm the serial leg's jit shapes
                t0 = time.perf_counter(); tp_run(False)
                t_s = time.perf_counter() - t0
                t0 = time.perf_counter(); tp_run(False)
                t_s = min(t_s, time.perf_counter() - t0)
                return t_s / t_b, "x_vs_serial", t_s / t_b

            _leg("throughput_batched_speedup_40x100x100", 300, leg_tp)

        # --- batched completeness_curve (VERDICT r2 #2): every azimuthal
        # injection at a radius reduces in ONE vmapped PCA program
        # (metrics.completeness._run_batch_device) vs the reference's
        # serial per-injection shape (reference completeness.py:52-218),
        # at a small shape. Disable with BENCH_COMPLETENESS=0.
        if os.environ.get("BENCH_COMPLETENESS", "1") == "1":
            def leg_cc():
                from scipy.ndimage import gaussian_filter

                from vip_tpu.fm.fakecomp import normalize_psf
                from vip_tpu.metrics import completeness as _cmod
                from vip_tpu.metrics.completeness import completeness_curve
                from vip_tpu.psfsub import pca as _pca

                # ADI cube with a stellar halo + static speckles (a
                # pure-noise cube has no detectable-contrast floor for
                # the probe to bracket)
                n_cc, sz_cc, nfc = 40, 100, 8
                yy, xx = np.mgrid[:sz_cc, :sz_cc]
                r2 = (yy - sz_cc // 2) ** 2 + (xx - sz_cc // 2) ** 2
                halo = 100.0 * np.exp(-r2 / (2 * (6 * 4.0) ** 2))
                speck = gaussian_filter(
                    rng.standard_normal((sz_cc, sz_cc)), 2.0) * 5
                cube_cc = np.stack([
                    halo + speck + gaussian_filter(
                        rng.standard_normal((sz_cc, sz_cc)), 1.5) * .5
                    for _ in range(n_cc)])
                ang_cc = np.linspace(0.0, 60.0, n_cc)
                yy, xx = np.mgrid[:19, :19]
                psf_cc = normalize_psf(
                    np.exp(-((yy - 9.0) ** 2 + (xx - 9.0) ** 2)
                           / (2 * (4 / 2.355) ** 2)), fwhm=4.0,
                    verbose=False)
                an_cc = [16]
                ini_cc = [0.01]  # near the converged level -> few probes

                def cc_run(batched):
                    orig = _cmod._run_batch_device
                    if not batched:
                        _cmod._run_batch_device = lambda *a, **k: None
                    try:
                        return completeness_curve(
                            cube_cc, ang_cc, psf_cc, 4.0, _pca,
                            an_dist=an_cc, ini_contrast=ini_cc,
                            starphot=100, n_fc=nfc, completeness=0.75,
                            algo_dict={"ncomp": 5}, verbose=False,
                            plot=False)
                    finally:
                        _cmod._run_batch_device = orig

                t0 = time.perf_counter(); cc_run(True)
                t_b = time.perf_counter() - t0          # incl. compile
                t0 = time.perf_counter(); cc_run(True)
                t_b = min(t_b, time.perf_counter() - t0)
                cc_run(False)         # warm the serial leg's jit shapes
                t0 = time.perf_counter(); cc_run(False)
                t_s = time.perf_counter() - t0
                t0 = time.perf_counter(); cc_run(False)
                t_s = min(t_s, time.perf_counter() - t0)
                return t_s / t_b, "x_vs_serial", t_s / t_b

            _leg("completeness_curve_batched_speedup_40x100x100_nfc8",
                 560, leg_cc)

        # --- invprob absolute wall times at the golden-snapshot configs
        # (VERDICT r3 #3). vs_baseline: the reference measured on THIS
        # host at the same configs, nproc=1 (single physical core —
        # serial IS its best here), tools/measure_ref_baselines.py:
        # andromeda 12.48 s, FastPACO 176.60 s, fmmf(min_r=26,max_r=30)
        # FMMF_SMALL_REF_S (the golden 26-34 window costs the reference
        # 3365 s; the bench uses the narrower window to fit the driver's
        # budget and the baseline is re-measured at the same shape).
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        from gen_golden import input_dataset_cached, invprob_configs

        import vip_tpu.invprob as _ip

        FMMF_SMALL_REF_S = 1632.0
        ds = input_dataset_cached()
        g_cube, g_ang, g_psfn, g_fwhm = (ds["cube"], ds["angles"],
                                         ds["psfn"], ds["fwhm"])
        cfgs = {name: kw for name, _, kw, _ in invprob_configs(ds)}

        def leg_andro():
            # warm + min-of-2: the first in-process run pays jit traces
            # and compile-cache deserialization (~25 s) that no steady
            # deployment would (warm run measured 8.8 s, 2026-08-20)
            t = _time(lambda: jnp.asarray(_ip.andromeda(
                cube=g_cube.copy(), angle_list=g_ang, psf=g_psfn,
                **cfgs["andro_adi"])[0]), reps=2)
            return t, "seconds", 12.48 / t

        _leg("andromeda_61x101x101_lsq", 90, leg_andro)

        def leg_fastpaco():
            def paco_run():
                algo = _ip.FastPACO(cube=g_cube.copy(), angles=g_ang,
                                    psf=g_psfn, fwhm=g_fwhm, pixscale=1.0,
                                    verbose=False)
                a, _b = algo.run(cpu=1)
                # PACO leaves the sub-iwa / border region NaN by design —
                # nan_to_num so _time_once's finite materialization holds
                return jnp.nan_to_num(jnp.asarray(a))

            t = _time(paco_run, reps=2)
            return t, "seconds", 176.60 / t

        _leg("fastpaco_61x101x101", 150, leg_fastpaco)

        def leg_fmmf():
            kw_fm = dict(cfgs["fmmf_kl_adi"], max_r=30, verbose=False)
            t = _time(lambda: jnp.asarray(_ip.fmmf(
                cube=g_cube.copy(), angle_list=g_ang, psf=g_psfn,
                **kw_fm)[0]), reps=1)
            return t, "seconds", FMMF_SMALL_REF_S / t

        _leg("fmmf_klip_61x101x101_r26-30", 420, leg_fmmf)

        # --- at-scale end-to-end contrast curve (VERDICT r3 #3): empty
        # reduction + nbranch*fc_rad_sep device-injected pattern cubes
        # (ops/inject.py) reduced in HBM-sized vmapped chunks + batched
        # photometry. vs_baseline: the reference runs (1 + 9) full
        # algorithm passes (reference contrcurve.py:584-1096) — 10 x
        # the measured same-host reference pca at this scale
        # (tools/measure_ref_baselines.py pca_scale: PCA_SCALE_REF_S),
        # ignoring its injection/noise stages (conservative).
        def leg_cc_scale():
            from vip_tpu.metrics import contrast_curve
            from vip_tpu.psfsub import pca as _pca_full

            PCA_SCALE_REF_S = 347.0
            yy, xx = np.mgrid[:19, :19]
            psf_cc = np.exp(-((yy - 9.0) ** 2 + (xx - 9.0) ** 2)
                            / (2 * (4 / 2.355) ** 2))

            def cc_scale():
                cc = contrast_curve(cube, angles, psf_cc, 4.0,
                                    pxscale=0.027, starphot=1e6,
                                    algo=_pca_full, nbranch=3,
                                    ncomp=NCOMP, verbose=False, plot=False)
                return jnp.asarray(np.asarray(cc["sensitivity_student"]))

            t = _time_once(cc_scale)
            return t, "seconds", 10 * PCA_SCALE_REF_S / t

        _leg(f"contrast_curve_{N_FRAMES}x{SIZE}x{SIZE}_nbranch3", 420,
             leg_cc_scale)

        # --- at-scale annular PCA (VERDICT r3 #3) — LAST expensive leg
        # (it was the round-4 budget killer). The device-resident Gram
        # path (psfsub/pca_local._pca_adi_resident) — one upload,
        # per-frame library PCA in Gram space, on-device
        # derotate+collapse. vs_baseline: the reference's unit of work
        # at this scale is one LAPACK SVD per (annulus, frame) patch
        # (reference pca_local.py:830-909): 64,000 patches for
        # 512^2/asize=4. tools/measure_ref_annular_unit.py times the
        # reference's OWN do_pca_patch at the real segment widths, fits
        # t(p)=a+b*p and sums the bench geometry: ANN_REF_S seconds on
        # this host (re-measured 2026-08-20; the tool and this constant
        # must agree).
        def leg_annular():
            from vip_tpu.psfsub import pca_annular

            ANN_REF_S = 4520.0

            def ann_run():
                return jnp.asarray(pca_annular(
                    cube_d, angles, fwhm=4.0, asize=4, ncomp=NCOMP,
                    delta_rot=(0.1, 1), n_segments=1, verbose=False))

            t = _time(ann_run, reps=1)
            return t, "seconds", ANN_REF_S / t

        _leg(f"pca_annular_{N_FRAMES}x{SIZE}x{SIZE}_ncomp{NCOMP}", 420,
             leg_annular)

    # --- headline: PCA-ADI in the benchmarked speed mode (LAST line;
    # exempt from the budget guard so the driver's parsed line always
    # exists) ---
    print(f"# leg headline start t={_elapsed():.0f}s", file=sys.stderr,
          flush=True)
    t_head = _time(pca_run(ROT_MODE))
    _emit(f"pca_adi_fullfr_{N_FRAMES}x{SIZE}x{SIZE}_ncomp{NCOMP}_{ROT_MODE}",
          t_head, "seconds", 1.0 / t_head)


if __name__ == "__main__":
    main()
