"""Compile the REFERENCE project's C++ entropy modules as test fixtures.

Builds `/root/reference/DCVC_HEM/src/cpp/rans/rans_interface.cpp` (and
`ops/ops.cpp`) unmodified into real Python extension modules so the interop
tests can encode with one implementation and decode with the other across
the repo/reference boundary. Three ingredients the reference build normally
downloads or assumes:

- pybind11 headers: vendored inside tensorflow's include tree in this image
  (site-packages/tensorflow/include/external/pybind11/include).
- rans64.h: reconstructed from the public ryg_rans spec in this directory
  (the reference fetches it from GitHub at CMake time; zero egress here).
- CPython headers: sysconfig include path.

Nothing from the reference tree is copied into the repo — the .cpp files
are compiled from their read-only mounted paths into a cache directory.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))
REF_CPP = "/root/reference/DCVC_HEM/src/cpp"
CACHE = os.path.join(HERE, "_build")


def _pybind11_include():
    try:
        import tensorflow  # noqa: F401
        tf_dir = os.path.dirname(tensorflow.__file__)
    except Exception:
        # fall back to the venv layout without importing tf (slow import)
        import numpy
        sp = os.path.dirname(os.path.dirname(numpy.__file__))
        tf_dir = os.path.join(sp, "tensorflow")
    cand = os.path.join(tf_dir, "include", "external", "pybind11", "include")
    return cand if os.path.isdir(cand) else None


def build(force: bool = False):
    """Returns the directory containing MLCodec_rans / MLCodec_CXX .so files,
    or None (with a reason printed) if the fixture can't be built here."""
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    rans_so = os.path.join(CACHE, "MLCodec_rans" + suffix)
    cxx_so = os.path.join(CACHE, "MLCodec_CXX" + suffix)
    if not force and os.path.exists(rans_so) and os.path.exists(cxx_so):
        return CACHE

    if not os.path.isdir(REF_CPP):
        print("reference cpp tree not mounted", file=sys.stderr)
        return None
    pybind_inc = _pybind11_include()
    if pybind_inc is None:
        print("no pybind11 headers found in tensorflow include tree",
              file=sys.stderr)
        return None

    os.makedirs(CACHE, exist_ok=True)
    py_inc = sysconfig.get_paths()["include"]
    common = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-I", HERE,                      # reconstructed rans64.h
        "-I", pybind_inc,
        "-I", py_inc,
    ]
    jobs = [
        (os.path.join(REF_CPP, "rans", "rans_interface.cpp"), rans_so,
         ["-I", os.path.join(REF_CPP, "rans")]),
        (os.path.join(REF_CPP, "ops", "ops.cpp"), cxx_so, []),
    ]
    for src, out, extra in jobs:
        cmd = common + extra + [src, "-o", out]
        res = subprocess.run(cmd, capture_output=True, text=True)
        if res.returncode != 0:
            print(res.stderr[-4000:], file=sys.stderr)
            return None
    return CACHE


def load():
    """Build (if needed) and import the reference modules.

    Returns (MLCodec_rans, MLCodec_CXX) or (None, None)."""
    d = build()
    if d is None:
        return None, None
    if d not in sys.path:
        sys.path.insert(0, d)
    try:
        import MLCodec_rans  # type: ignore
        import MLCodec_CXX  # type: ignore
    except Exception as e:  # pragma: no cover
        print(f"import of built reference modules failed: {e}",
              file=sys.stderr)
        return None, None
    return MLCodec_rans, MLCodec_CXX


if __name__ == "__main__":
    d = build(force="--force" in sys.argv)
    print(d if d else "BUILD FAILED")
