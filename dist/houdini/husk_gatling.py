#!/usr/bin/env python3
"""Husk bridge: a husk-style command line mapped onto the gatling_tpu CLI.

The reference registers hdGatling directly with Houdini's USD render stack
(reference: dist/houdini + .github/workflows/build.yml:168-180); Solaris
then drives it through `husk`. gatling_tpu is a Python renderer without a
pxr plugin, so UsdRenderers.json points Houdini at this bridge instead: it
accepts the husk argument subset Solaris emits and forwards to
`python -m gatling_tpu.cli`.

Usage (husk-compatible subset):
    husk_gatling.py scene.usd -o out.png --res 1200 1200 \
        --pixel-samples 64 --camera /cameras/main [--gatling:FLAG VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="husk_gatling", add_help=True)
    p.add_argument("usdfile", help="input USD scene")
    p.add_argument("-o", "--output", default="render.png",
                   help="output image path (husk -o)")
    p.add_argument("--res", "-res", nargs=2, type=int, default=None,
                   metavar=("W", "H"), help="resolution (husk --res)")
    p.add_argument("--pixel-samples", "-ps", type=int, default=None,
                   help="samples per pixel (husk --pixel-samples)")
    p.add_argument("--camera", "-c", default=None, help="camera prim path")
    p.add_argument("--renderer", "-R", default=None,
                   help="accepted and ignored (this IS the renderer)")
    p.add_argument("--frame", "-f", type=float, default=None,
                   help="accepted; gatling_tpu renders the loaded frame")
    p.add_argument("--verbose", "-V", nargs="?", const="1", default=None,
                   help="accepted and ignored")
    return p


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # husk renderer-namespaced options pass straight through to the CLI:
    # --gatling:next-event-estimation -> --next-event-estimation
    passthrough: list[str] = []
    filtered: list[str] = []
    it = iter(range(len(argv)))
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--gatling:"):
            passthrough.append("--" + a[len("--gatling:"):])
            if i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                passthrough.append(argv[i + 1])
                i += 1
        else:
            filtered.append(a)
        i += 1

    args = build_parser().parse_args(filtered)
    cmd = [sys.executable, "-m", "gatling_tpu.cli", args.usdfile, args.output]
    if args.res:
        cmd += ["--image-width", str(args.res[0]),
                "--image-height", str(args.res[1])]
    if args.pixel_samples is not None:
        cmd += ["--spp", str(args.pixel_samples)]
    if args.camera:
        cmd += ["--camera-path", args.camera]
    cmd += passthrough

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gatling_jax_cache")
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    sys.exit(main())
