"""Scaling-efficiency harness: data-parallel throughput over an N-device
mesh (BASELINE.json target: >=80% efficiency 1 host -> N hosts).

Only one real TPU chip is reachable in this environment, so by default
this runs on a virtual CPU mesh (``--devices 8`` spoofed host devices) to
validate the mechanics — per-device batch held constant (weak scaling),
throughput should grow ~linearly with devices. On a real pod slice run it
with JAX_PLATFORMS unset and it measures true ICI scaling.

Prints one JSON line:
  {"metric": "scaling_efficiency_<maxdev>dev", "value": eff, ...}
"""

import argparse
import json
import sys
import time


def measure(n_devices: int, per_device_batch: int, steps: int, model: str):
    import jax
    import numpy as np

    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import tiny_schema
    from rank_tpu.models import default_config
    from rank_tpu.parallel.mesh import make_mesh
    from rank_tpu.train import TrainConfig, Trainer

    mesh = make_mesh(num_devices=n_devices)
    batch = per_device_batch * n_devices
    schema = tiny_schema(vocab=4096, hist_len=16)
    trainer = Trainer(
        schema,
        default_config(model),
        TrainConfig(batch_size=batch, log_every=0),
        mesh=mesh,
    )
    data = make_synthetic_dataset(schema, num_rows=batch * 4, seed=0)
    batches = []
    for i in range(4):
        b = {k: v[i * batch : (i + 1) * batch] for k, v in data.items()}
        b["_valid"] = np.ones((batch,), np.float32)
        batches.append(trainer._host_to_device(b))
    state = trainer.init_state(batches[0])
    step_fn = trainer._get_compiled("train")
    meters = trainer.meters_init()
    for i in range(3):
        state, meters = step_fn(state, meters, batches[i % 4])
    float(meters["loss"])  # true fence (block_until_ready may not wait here)
    t0 = time.perf_counter()
    for i in range(steps):
        state, meters = step_fn(state, meters, batches[i % 4])
    float(meters["loss"])  # true fence (block_until_ready may not wait here)
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--per_device_batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--model", type=str, default="dcn")
    ap.add_argument(
        "--real", action="store_true",
        help="use the real accelerator platform (default: virtual CPU mesh "
        "— one real chip can't scale, and CPU 'devices' share cores so the "
        "CPU numbers validate mechanics only)",
    )
    args = ap.parse_args()

    import os

    if not args.real:
        # must happen BEFORE the jax backend initializes
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    if len(jax.devices()) < args.devices:
        print(
            f"# only {len(jax.devices())} devices visible; cannot build a "
            f"{args.devices}-device mesh",
            file=sys.stderr,
        )
        sys.exit(2)

    sizes = []
    n = 1
    while n <= args.devices:
        sizes.append(n)
        n *= 2
    results = {}
    for n in sizes:
        eps = measure(n, args.per_device_batch, args.steps, args.model)
        results[n] = eps
        print(
            f"# {n} devices: {eps:,.0f} ex/s ({eps/n:,.0f} ex/s/device)",
            file=sys.stderr,
        )
    base = results[sizes[0]]
    top = sizes[-1]
    eff = results[top] / (base * top)
    print(
        json.dumps(
            {
                "metric": f"scaling_efficiency_{top}dev_{args.model}",
                "value": round(eff, 3),
                "unit": "fraction_of_linear",
                "per_device_examples_per_s": {
                    str(k): round(v / k, 1) for k, v in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
