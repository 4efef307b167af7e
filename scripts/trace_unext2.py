"""Device-time split for UNeXt2 inference (virtual-stain hot path).

Real-chip 2048^2 measured 108.4 ms/stack vs a ~5 ms MXU floor — this
traces the production architecture at 1024^2 (same graph, quarter the
spatial work) to find where the time goes: the ConvNeXtV2 depthwise 7x7
convs (XLA lowers depthwise convs poorly on TPU), the PixelShuffle
relayouts, or the pointwise matmuls themselves.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from biahub_tpu.models.unext2 import UNeXt2
from biahub_tpu.runtime.profiling import summarize_device_trace

HW = 1024
ITERS = 5


def main():
    print("device:", jax.devices()[0], flush=True)
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

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.random((1, 1, 15, HW, HW), dtype=np.float32))
    )
    t0 = time.perf_counter()
    out = apply(variables, x)
    float(out[0, 0, 0, 0, 0])
    print(f"compile+first {time.perf_counter() - t0:.1f}s", flush=True)

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = apply(variables, x)
        float(out[0, 0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"unext2 {HW}^2: {best * 1e3:.2f} ms", flush=True)

    td = "/tmp/unext2_trace"
    with jax.profiler.trace(td):
        for _ in range(ITERS):
            out = apply(variables, x)
        float(out[0, 0, 0, 0, 0])
    summarize_device_trace(td, top=25, file=sys.stdout)


if __name__ == "__main__":
    main()
