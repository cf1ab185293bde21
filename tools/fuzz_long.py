"""Long-running native-parser fuzz (extended tests/test_native_fuzz.py).

Same mutation engine as the CI fuzz but with a fresh seed per batch and
unbounded batches — run overnight/background:

    nohup python -u tools/fuzz_long.py --minutes 120 > /tmp/fuzz_long.log &

Each batch forks a subprocess per input kind so a native crash is
reported (seed + kind printed for reproduction) without killing the
driver. Any non-zero subprocess exit is a finding.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import textwrap
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    sys.path.insert(0, "@REPO@")
    from tests.test_gltf import _accessor_blob, _base_gltf, _make_glb
    from madrona_renderer_tpu import native
    from madrona_renderer_tpu.assets.png import encode_png

    tmp, kind, seed, trials = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    rng = np.random.default_rng(seed)

    blob, views, accessors, _, _ = _accessor_blob()
    glb = _make_glb(_base_gltf(views, accessors), blob)
    png = encode_png(rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8))
    from madrona_renderer_tpu.assets.etc1s_encode import encode_ktx2_etc1s
    ktx2 = encode_ktx2_etc1s(
        rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    )
    from madrona_renderer_tpu.assets import astc as astc_mod
    from madrona_renderer_tpu.assets.ktx2 import encode_ktx2_payload
    try:
        img16 = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
        astc = encode_ktx2_payload(
            astc_mod.encode_astc_image(img16), 16, 16, vk_format=157)
    except Exception:
        astc = None
    obj_text = (
        "v 0 0 0\\nv 1 0 0\\nv 0 1 0\\nvt 0 0\\nvt 1 0\\nvt 0 1\\n"
        "f 1/1 2/2 3/3\\n"
    ).encode()

    def mutations(data):
        data = bytearray(data)
        n = len(data)
        for trial in range(trials):
            m = bytearray(data)
            op = trial % 4
            if op == 0:  # flip random bytes
                for _ in range(rng.integers(1, 8)):
                    m[rng.integers(0, n)] = rng.integers(0, 256)
            elif op == 1:  # truncate
                m = m[: rng.integers(0, n)]
            elif op == 2:  # splice random garbage
                at = rng.integers(0, n)
                m[at:at] = bytes(
                    rng.integers(0, 256, size=16, dtype=np.uint8))
            else:  # hostile 32-bit fields at aligned offsets
                for _ in range(rng.integers(1, 4)):
                    at = int(rng.integers(0, max(n - 4, 1)) // 4 * 4)
                    val = rng.choice(np.array(
                        [0xFFFFFFFF, 0x7FFFFFFF, 0x80000000, 100_000_000],
                        dtype=np.uint32))
                    m[at:at + 4] = int(val).to_bytes(4, "little")
            yield bytes(m)

    srcs = {"glb": glb, "png": png, "obj": obj_text, "ktx2": ktx2}
    if astc is not None:
        srcs["astc"] = astc
    src = srcs[kind]
    survived = 0
    for i, m in enumerate(mutations(src)):
        try:
            if kind == "png":
                native.decode_png_native(m)
            elif kind in ("ktx2", "astc"):
                from madrona_renderer_tpu.assets.ktx2 import decode_ktx2

                decode_ktx2(m)
            else:
                p = os.path.join(tmp, f"fz.{kind}")
                with open(p, "wb") as f:
                    f.write(m)
                if kind == "glb":
                    native.parse_gltf_native(p)
                else:
                    native.parse_obj_native(p)
            survived += 1
        except Exception:
            pass
    print(f"OK {kind} seed={seed}: {survived}/{trials} parsed cleanly",
          flush=True)
    """
).replace("@REPO@", REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=120.0)
    ap.add_argument("--trials", type=int, default=600)
    ap.add_argument("--seed0", type=int, default=20260819)
    args = ap.parse_args()

    kinds = ["glb", "png", "obj", "ktx2", "astc"]
    t_end = time.time() + args.minutes * 60
    seed = args.seed0
    findings = 0
    batch = 0
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    while time.time() < t_end:
        for kind in kinds:
            with tempfile.TemporaryDirectory() as tmp:
                r = subprocess.run(
                    [sys.executable, "-c", _DRIVER, tmp, kind,
                     str(seed), str(args.trials)],
                    capture_output=True, text=True, timeout=900, env=env,
                )
            if r.returncode != 0:
                findings += 1
                print(f"FINDING kind={kind} seed={seed} rc={r.returncode}\n"
                      f"{r.stdout[-300:]}\n{r.stderr[-1500:]}", flush=True)
            else:
                print(r.stdout.strip(), flush=True)
            seed += 1
        batch += 1
    print(f"DONE: {batch} batches, {findings} findings", flush=True)
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
