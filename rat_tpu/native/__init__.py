"""Native host-side runtime components (C++).

``fastenc`` accelerates the feature-pipeline hot loops (vocab encode,
sequence tokenize+pad, token counting) — at Tmall scale these are
hundreds of millions of Python dict probes otherwise. The extension is
built on first use (g++ via setuptools); the pure-Python paths remain
the fallback, and results are bit-identical (tested).
"""

import logging
import os
import subprocess
import sys
import sysconfig

_here = os.path.dirname(os.path.abspath(__file__))
fastenc = None


def _try_import():
    global fastenc
    if _here not in sys.path:
        sys.path.insert(0, _here)
    try:
        import fastenc as _m
        fastenc = _m
        return True
    except ImportError:
        return False


def build(verbose=False):
    """Compile fastenc.cpp in-place; returns True on success."""
    global fastenc
    if fastenc is not None:
        return True
    src = os.path.join(_here, "fastenc.cpp")
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(_here, "fastenc" + suffix)
    if not os.path.exists(out) or \
            os.path.getmtime(out) < os.path.getmtime(src):
        include = sysconfig.get_paths()["include"]
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
               f"-I{include}", src, "-o", out]
        try:
            subprocess.run(cmd, check=True, capture_output=not verbose)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            logging.info("fastenc build failed (%s); using Python fallback", e)
            return False
    return _try_import()


_try_import()
