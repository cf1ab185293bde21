"""Crash-safety fuzz of the native C++ parsers (importer.cpp, gltf.cpp,
pymodule.cpp): byte-mutated and truncated inputs must surface as Python
exceptions or clean fallbacks, never interpreter crashes.

Each fuzz batch runs in a subprocess so a segfault fails the test
instead of killing the pytest process. Mutations are deterministic
(seeded) for reproducibility; valid seeds come from the in-repo
fixture generators.
"""

import os
import subprocess
import sys
import textwrap

import pytest

from madrona_renderer_tpu import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native tier unavailable"
)

_DRIVER = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    sys.path.insert(0, "@REPO@")
    from tests.test_gltf import _accessor_blob, _base_gltf, _make_glb
    from madrona_renderer_tpu import native
    from madrona_renderer_tpu.assets.png import encode_png

    rng = np.random.default_rng(1234)
    tmp = sys.argv[1]
    kind = sys.argv[2]

    blob, views, accessors, _, _ = _accessor_blob()
    glb = _make_glb(_base_gltf(views, accessors), blob)
    png = encode_png(rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8))
    from madrona_renderer_tpu.assets.etc1s_encode import encode_ktx2_etc1s
    ktx2 = encode_ktx2_etc1s(
        rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    )
    obj_text = (
        "v 0 0 0\\nv 1 0 0\\nv 0 1 0\\nvt 0 0\\nvt 1 0\\nvt 0 1\\n"
        "f 1/1 2/2 3/3\\n"
    ).encode()

    def mutations(data):
        data = bytearray(data)
        n = len(data)
        for trial in range(300):
            m = bytearray(data)
            op = trial % 3
            if op == 0:  # flip random bytes
                for _ in range(rng.integers(1, 8)):
                    m[rng.integers(0, n)] = rng.integers(0, 256)
            elif op == 1:  # truncate
                m = m[: rng.integers(0, n)]
            else:  # splice random garbage
                at = rng.integers(0, n)
                m[at:at] = bytes(rng.integers(0, 256, size=16, dtype=np.uint8))
            yield bytes(m)

    src = {"glb": glb, "png": png, "obj": obj_text, "ktx2": ktx2}[kind]
    survived = 0
    for i, m in enumerate(mutations(src)):
        try:
            if kind == "png":
                native.decode_png_native(m)
            elif kind == "ktx2":
                # Routes the BasisLZ payload through the native ETC1S
                # entropy decoder (etc1s.cpp) — the classic bitstream
                # hang/overflow surface.
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
    print(f"OK {kind}: {survived} parsed cleanly of 300")
    """
).replace("@REPO@", REPO)


@pytest.mark.parametrize("kind", ["glb", "png", "obj", "ktx2"])
def test_native_fuzz_no_crash(kind, tmp_path):
    # Generous timeout: the 300-trial driver takes ~1 min alone but has
    # timed out at 600 s on a machine also running the TPU chain + the
    # long fuzz battery.
    r = subprocess.run(
        [sys.executable, "-c", _DRIVER, str(tmp_path), kind],
        capture_output=True, text=True, timeout=1800,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, (
        f"native {kind} parser crashed the interpreter "
        f"(rc={r.returncode}):\n{r.stdout[-500:]}\n{r.stderr[-2000:]}"
    )
    assert f"OK {kind}" in r.stdout


@pytest.mark.parametrize("mutation", ["huge_count", "neg_offset"])
def test_hostile_glb_sizes_fail_cleanly(mutation, tmp_path):
    """Structured hostile values (not just byte flips): a declared
    accessor count of 100M drove an unchecked 2.4 GB allocation in
    gltf.cpp (std::bad_alloc escaped through the C boundary →
    std::terminate), and a negative byteOffset wrapped through size_t
    past the range check into an out-of-bounds read. Both must surface
    as Python exceptions."""
    import numpy as np
    import subprocess

    from tests.test_gltf import _accessor_blob, _base_gltf, _make_glb

    blob, views, accessors, _, _ = _accessor_blob()
    g = _base_gltf([dict(v) for v in views], [dict(a) for a in accessors])
    if mutation == "huge_count":
        g["accessors"][0]["count"] = 100_000_000
    else:
        g["bufferViews"][0]["byteOffset"] = -8
    p = str(tmp_path / f"{mutation}.glb")
    with open(p, "wb") as f:
        f.write(_make_glb(g, blob))
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys, resource;"
         "resource.setrlimit(resource.RLIMIT_AS, (1 << 30, 1 << 30));"
         f"sys.path.insert(0, {REPO!r});"
         "from madrona_renderer_tpu.assets.importer import AssetImporter;"
         "AssetImporter().import_from_disk([sys.argv[1]])", p],
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 1, (
        f"expected a clean Python exception, got rc={r.returncode}:\n"
        f"{r.stderr[-1500:]}"
    )
    assert "Error" in r.stderr


def test_hostile_ktx2_dims_fail_cleanly(tmp_path):
    """A KTX2 header claiming 50000×50000 must surface as MemoryError/
    ValueError, never an abort (same class as the GLB accessor count)."""
    import struct
    import subprocess

    import numpy as np

    from madrona_renderer_tpu.assets.etc1s_encode import encode_ktx2_etc1s

    data = bytearray(encode_ktx2_etc1s(np.full((8, 8, 4), 7, np.uint8)))
    struct.pack_into("<II", data, 20, 50000, 50000)  # pixelWidth/Height
    p = str(tmp_path / "huge.ktx2")
    with open(p, "wb") as f:
        f.write(bytes(data))
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys, resource;"
         "resource.setrlimit(resource.RLIMIT_AS, (2 << 30, 2 << 30));"
         f"sys.path.insert(0, {REPO!r});"
         "from madrona_renderer_tpu.assets.ktx2 import decode_ktx2;"
         "decode_ktx2(open(sys.argv[1], 'rb').read())", p],
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 1, f"rc={r.returncode}:\n{r.stderr[-1200:]}"
    assert "Error" in r.stderr
