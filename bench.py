"""Benchmark: full-frame PCA-ADI reduction of a 1000×512×512 cube.

North-star target (BASELINE.json): < 1 s on one TPU v5e chip. The whole
reduction — prepare → SVD (eigen/Gram on the MXU) → project/subtract →
FFT 3-shear derotation of all 1000 frames (4× padded, flux-preserving, same
math as the reference's 'vip-fft') → median collapse — runs as one jitted
XLA program.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline = baseline_seconds (1.0) / measured_seconds (>1 beats target).
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
# rotation mode for the derotation stage:
#  'fft-small' = 3-shear FFT rotation on a 1.25x canvas (default; same
#     rotation math as the reference's 'vip-fft', smaller zero-pad margin)
#  'fft'       = the reference's exact 4x-padded flux-preserving pipeline
#  'interp'    = bicubic gather rotation (reference's OpenCV analog)
ROT_MODE = os.environ.get("BENCH_ROT", "fft-small")


def main():
    import jax
    import jax.numpy as jnp
    from vip_tpu.ops.pipeline import pca_adi_pipeline

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    cube = rng.standard_normal((N_FRAMES, SIZE, SIZE)).astype(np.float32)
    angles = np.linspace(0.0, 80.0, N_FRAMES).astype(np.float32)

    cube_d = jax.device_put(jnp.asarray(cube), dev)
    ang_d = jax.device_put(jnp.asarray(angles), dev)

    # chunk the derotation so the 4x-padded complex FFT working set fits HBM
    chunk = int(os.environ.get("BENCH_CHUNK", 25))

    chunk_interp = int(os.environ.get("BENCH_CHUNK_INTERP", 125))

    def run():
        return pca_adi_pipeline(
            cube_d, ang_d, ncomp=NCOMP, method="eigen", collapse="median",
            chunk=chunk_interp if ROT_MODE != "fft" else chunk,
            rot_mode=ROT_MODE, interpolation="bicubic")

    # compile + warm-up (fetch a scalar to force execution on remote/async
    # backends where block_until_ready may return early)
    out = run()
    float(jnp.sum(out))

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run()
        checksum = float(jnp.sum(out))
        times.append(time.perf_counter() - t0)
    best = min(times)

    assert np.isfinite(checksum)

    print(json.dumps({
        "metric": f"pca_adi_fullfr_{N_FRAMES}x{SIZE}x{SIZE}_ncomp{NCOMP}_{ROT_MODE}",
        "value": round(best, 4),
        "unit": "seconds",
        "vs_baseline": round(1.0 / best, 3),
    }))


if __name__ == "__main__":
    main()
