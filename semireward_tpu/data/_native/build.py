"""Build the native batch-assembly library: g++ -O3 -shared -fPIC."""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _have_libjpeg() -> bool:
    """Probe-compile a one-liner against jpeglib.h + -ljpeg."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        probe = os.path.join(td, "probe.cpp")
        with open(probe, "w") as f:
            f.write("#include <cstdio>\n#include <jpeglib.h>\n"
                    "int main(){jpeg_decompress_struct c;(void)c;return 0;}")
        r = subprocess.run(
            ["g++", "-o", os.path.join(td, "probe"), probe, "-ljpeg"],
            capture_output=True)
        return r.returncode == 0


def build(verbose: bool = True) -> str:
    src = os.path.join(HERE, "fastbatch.cpp")
    out = os.path.join(HERE, "libfastbatch.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           "-o", out, src]
    if _have_libjpeg():
        cmd[1:1] = ["-DHAVE_LIBJPEG"]
        cmd.append("-ljpeg")
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
    from semireward_tpu.data import _native

    assert _native.available()
    import numpy as np

    src = np.arange(64, dtype=np.uint8).reshape(8, 8)
    got = _native.gather_rows(src, np.asarray([3, 1, 7]))
    np.testing.assert_array_equal(got, src[[3, 1, 7]])
    waves = [np.arange(10, dtype=np.float32), np.arange(3, dtype=np.float32)]
    out = _native.crop_pad_f32(waves, np.asarray([2, 0]), 5)
    np.testing.assert_array_equal(out[0], [2, 3, 4, 5, 6])
    np.testing.assert_array_equal(out[1], [0, 1, 2, 0, 0])
    print("fastbatch OK")
