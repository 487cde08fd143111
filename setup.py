"""Build hooks: compile the native runtime during wheel builds.

The reference ships prebuilt release binaries via bazel
(build_release_binaries.sh); here the only native artifact is
`deepvariant_tpu/io/_dvnative.so` (BGZF/CRC32C/SSW/fast-pass/rANS/
DBG/BAM-scan hot loops, native/dvnative.cc), a plain C++17 shared
library loaded through ctypes — no Python ABI coupling, so one .so
serves every CPython version.
"""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


ROOT = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(ROOT, "native", "dvnative.cc")
OUT = os.path.join(ROOT, "deepvariant_tpu", "io", "_dvnative.so")


def compile_native(march: str = "") -> bool:
    """Compile dvnative.cc -> _dvnative.so. Returns False when no
    compiler is available (the Python fallbacks keep everything
    working, just slower)."""
    cxx = os.environ.get("CXX") or shutil.which("g++") or shutil.which(
        "clang++")
    if cxx is None or not os.path.exists(SRC):
        return False
    arch = march or os.environ.get("DVNATIVE_MARCH", "x86-64-v2")
    cmd = [cxx, "-O3", "-fPIC", "-std=c++17", "-Wall",
           f"-march={arch}", "-shared", "-o", OUT, SRC, "-lz"]
    subprocess.run(cmd, check=True)
    return True


class BuildPyWithNative(build_py):
    def run(self):
        if not os.path.exists(OUT):
            try:
                compile_native()
            except subprocess.CalledProcessError as e:
                self.warn(f"native build failed ({e}); installing with "
                          "Python fallbacks only")
        super().run()


if __name__ == "__main__":
    setup(cmdclass={"build_py": BuildPyWithNative})
