"""Model-inference throughput on the real chip (production configs).

Not part of bench.py's driver-consumed detail block because the UNeXt2
remote compile alone runs 8-18 minutes over the axon tunnel (the compiled
step is fast; the tunnel pays per-process compiles). Measured real-chip
numbers are recorded in docs/models.md.

- UNeXt2: the reference virtual-stain architecture verbatim
  (settings/example_virtual_stain_settings.yml: fcmae, dims
  [96,192,384,768], stack depth 15, stem (5,4,4)); reference runs VisCy
  VSUNet on GPU torch (biahub/virtual_stain.py:52-57).
- CPnet: cellpose-schema network at production width (nbase
  2,32,64,128,256); reference runs cellpose CUDA torch
  (biahub/segment.py:92-99). Also recorded by bench.py as cpnet_seg_ms.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

HW = int(sys.argv[1]) if len(sys.argv) > 1 else 2048


def _bench(apply, variables, x, probe, name):
    t0 = time.perf_counter()
    out = apply(variables, x)
    probe(out)
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            out = apply(variables, x)
        probe(out)
        best = min(best, (time.perf_counter() - t0) / 3)
    print(f"{name}: {best * 1e3:.2f} ms", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(1)

    from biahub_tpu.models.unext2 import UNeXt2

    model = UNeXt2(
        in_channels=1, out_channels=2, in_stack_depth=15,
        encoder_blocks=(3, 3, 9, 3), dims=(96, 192, 384, 768),
        decoder_conv_blocks=2, stem_kernel_size=(5, 4, 4),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 15, 32, 32)))

    @jax.jit
    def apply(v, x):
        with jax.default_matmul_precision("bfloat16"):
            return model.apply(v, x)

    x = jax.device_put(
        jnp.asarray(rng.random((1, 1, 15, HW, HW), dtype=np.float32))
    )
    _bench(apply, variables, x,
           lambda r: float(r[0, 0, 0, 0, 0]), f"unext2 (15,{HW},{HW})")

    from biahub_tpu.models.cpnet import CPnet

    cmodel = CPnet(nbase=(2, 32, 64, 128, 256))
    cvars = cmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64)))

    @jax.jit
    def capply(v, x):
        with jax.default_matmul_precision("bfloat16"):
            return cmodel.apply(v, x)

    cx = jax.device_put(
        jnp.asarray(rng.random((1, 2, HW, HW), dtype=np.float32))
    )
    _bench(capply, cvars, cx,
           lambda r: float(r[0][0, 0, 0, 0]), f"cpnet ({HW},{HW})")


if __name__ == "__main__":
    main()
