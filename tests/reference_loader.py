"""Loader for the upstream reference's pure-Python decoders.

The reference at /root/reference is Python-3-importable for its protocol
layer (p25_general.py, p25p2_lfsr.py, p25_cai.py, p25_moto.py,
bit_utils.py).  The demod modules import GNU Radio at module scope, so
the two pure functions we need from them (EDACS bch_decode, Moto
deinterleave) are extracted from source via ast without executing the
module.

NumPy 2 removed np.mat (used by p25p2_lfsr.py:83); shim it before
import.  Nothing here is copied into the product — these are test
oracles only.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

import numpy as np

REFERENCE_DIR = Path("/root/reference")


def available() -> bool:
    return (REFERENCE_DIR / "p25_general.py").exists()


def load():
    """Import the reference protocol modules; returns a namespace dict."""
    if not hasattr(np, "mat"):
        np.mat = np.asmatrix  # NumPy 2 shim for p25p2_lfsr.py:83
    ref = str(REFERENCE_DIR)
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import bit_utils  # noqa: F401  (p25p2_lfsr dependency)
    import p25_cai
    import p25_general
    import p25_moto
    import p25p2_lfsr

    return {
        "p25_general": p25_general.p25_general(),
        "p25p2_lfsr": p25p2_lfsr.p25p2_lfsr,
        "cai_table": p25_cai.p25_cai().tsbk_osp_single,
        "moto_table": p25_moto.p25_moto().tsbk_osp_single,
    }


def extract_method(path: Path, clsname: str, method: str):
    """Compile a single method out of a module we cannot import
    (edacs/moto demods import gnuradio at module scope).  The methods we
    take (bch_decode, deinterleave) only use locals + their args, so a
    bare function with a dummy ``self`` slot works."""
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == clsname:
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name == method:
                    mod = ast.Module(body=[item], type_ignores=[])
                    ns: dict = {}
                    exec(compile(ast.fix_missing_locations(mod),
                                 str(path), "exec"), ns)
                    return ns[method]
    raise KeyError(f"{clsname}.{method} not found in {path}")


def ref_edacs_bch_decode():
    """Reference BCH(48,36,5) decoder (edacs_control_demod.py:451-518)."""
    fn = extract_method(REFERENCE_DIR / "edacs_control_demod.py",
                        "edacs_control_demod", "bch_decode")
    return lambda s: fn(None, s)


def ref_moto_deinterleave():
    """Reference 4x19 deinterleaver (moto_control_demod.py:196-203)."""
    fn = extract_method(REFERENCE_DIR / "moto_control_demod.py",
                        "moto_control_demod", "deinterleave")
    return lambda s: fn(None, s)
