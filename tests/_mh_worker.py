"""Subprocess worker for the real multi-process multihost test.

Runs as one of N processes: forces the CPU backend with 4 virtual devices,
joins the jax.distributed cluster, then drives the real CLI with --multihost
(hybrid mesh, per-host batch slices, primary-only artifact writes)."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_default_matmul_precision", "highest")


def main() -> int:
    port, pid, nproc, root, outdir = sys.argv[1:6]
    extra = sys.argv[6:] or ["--train", "--n_epochs", "2"]
    jax.distributed.initialize(f"localhost:{port}", int(nproc), int(pid))
    from chexpert_tpu.cli.chexpert import main as chexpert_main

    return chexpert_main([
        "--data_path", root, "--output_dir", outdir,
        "--model", "densenet-tiny", "--image_size", "32",
        "--batch_size", "8", "--lr", "1e-2",
        "--log_interval", "1", "--eval_interval", "2",
        "--compute_dtype", "float32", "--data_workers", "2",
        "--multihost",
    ] + extra) or 0


if __name__ == "__main__":
    sys.exit(main())
