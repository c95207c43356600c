"""Measure host->device transfer + dispatch overheads over the chip tunnel.

The bench averages ~11 ms/frame while the pure device-side step averages
~6-9 ms/frame; this quantifies the host-side slices: uint8 frame-batch upload
bandwidth, dispatch latency, scalar readback latency.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), jax.devices())
    B, H, W = 48, 480, 640
    imgs = np.random.default_rng(0).integers(0, 255, (B, H, W), np.uint8)

    # Upload bandwidth.
    x = jax.device_put(imgs)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        x = jax.device_put(imgs)
        jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / reps
    mb = imgs.nbytes / 1e6
    print(f"device_put [48,480,640] u8 ({mb:.1f} MB): {dt * 1e3:.1f} ms "
          f"({mb / dt:.0f} MB/s) = {dt / B * 1e3:.2f} ms/frame")

    # Is device_put async? (dispatch without block)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = jax.device_put(imgs)
    nonblock = (time.perf_counter() - t0) / reps
    jax.block_until_ready(x)
    print(f"device_put without block: {nonblock * 1e3:.1f} ms")

    # Dispatch + readback latency of a trivial program.
    f = jax.jit(lambda a: a.sum())
    s = f(x)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(20):
        s = f(x)
        jax.block_until_ready(s)
    print(f"tiny dispatch+block round trip: "
          f"{(time.perf_counter() - t0) / 20 * 1e3:.1f} ms")

    # float32 vs uint8 upload (4x bytes)
    imgs_f = imgs.astype(np.float32) / 255.0
    y = jax.device_put(imgs_f)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(5):
        y = jax.device_put(imgs_f)
        jax.block_until_ready(y)
    dtf = (time.perf_counter() - t0) / 5
    print(f"device_put f32 ({imgs_f.nbytes / 1e6:.0f} MB): {dtf * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
