"""Guard: exactness/parity-bearing matmuls must pin an explicit precision.

TPU lowers fp32 matmuls to ONE bf16 pass by default (8 mantissa bits), which
silently corrupted the binning layout at scale while every CPU test stayed
green (CPU matmuls are exact at any precision, so the rounding cannot be
simulated here — verified: forcing default_matmul_precision('bfloat16') on
CPU still yields exact results).  The only durable protection is structural:
every jnp.dot / jnp.matmul / jnp.einsum / `@` in the modules whose matmuls
carry integers, world coordinates, or reference-parity activations must pass
an explicit `precision=` (see CLAUDE.md for the post-mortem).

Round-3 update: the Pallas exemption is GONE.  In this environment Mosaic's
in-kernel jnp.dot ALSO lowers to one bf16 pass on the real chip (caught
on-chip by tools/smoke_tpu.py integer cross-checks and parity_onchip image
drift; round-1's "Mosaic fp32 dots are exact" probe no longer reproduces).
Every kernel dot must pin precision too — local wrappers (_dot32) that pin
internally satisfy the guard at their call sites.
"""

import ast
import os

import pytest

PKG = os.path.join(os.path.dirname(__file__), "..", "gs_deformable_tpu")

# Modules whose matmul operands exceed 2^8 or carry parity-critical values.
GUARDED = [
    "ops/scan_utils.py",
    "ops/projection.py",
    "ops/rigid.py",
    "ops/knn.py",
    "models/deform.py",
    "models/gaussians.py",
    "ops/pallas/composite.py",
    "ops/pallas/stream_composite.py",
    "ops/pallas/packed_composite.py",
    "ops/pallas/ordered_fill.py",
]

MATMUL_FUNCS = {"dot", "matmul", "einsum", "tensordot", "vdot"}


def _calls_without_precision(path):
    src = open(path).read()
    tree = ast.parse(src)
    bad = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            name = None
            if isinstance(f, ast.Attribute) and f.attr in MATMUL_FUNCS:
                name = f.attr
            elif isinstance(f, ast.Name) and f.id in MATMUL_FUNCS:
                name = f.id
            if name is None:
                continue
            # local wrappers that pin precision internally are fine
            kw = {k.arg for k in node.keywords}
            if "precision" not in kw:
                bad.append((node.lineno, name))
        elif isinstance(node, ast.BinOp) and isinstance(node.op, ast.MatMult):
            bad.append((node.lineno, "@"))
    return bad


@pytest.mark.parametrize("rel", GUARDED)
def test_no_unpinned_matmuls(rel):
    path = os.path.join(PKG, rel)
    bad = _calls_without_precision(path)
    assert not bad, (
        f"{rel} has matmuls without an explicit precision= (TPU default is "
        f"one bf16 pass — see CLAUDE.md): {bad}"
    )
