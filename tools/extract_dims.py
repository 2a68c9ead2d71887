"""Extract the reference's entity dictionaries into a JSON dim file.

The reference (`/root/reference/extractorAvaluos.py`) embeds its entity
dictionaries as literals inside function bodies:

- ``pre_estado`` holds the 34-entry state-prefix -> canonical-state map
  (extractorAvaluos.py:182-229);
- ``estados_digitos`` holds the 32-entry 2-digit-code -> state map
  (extractorAvaluos.py:231-249);
- ``estado`` holds the ordered keyword list ``estados_clave``
  (extractorAvaluos.py:264-271) -- including its concatenated-literal
  quirk (missing comma makes ``'CIUDAD DE MÉESTADO DE ME'`` one entry);
- ``pre_municipio`` is a 31-branch if/elif where each branch carries a
  per-state alias list (``ciudades_clave``) and alias->canonical dict
  (``patrones_ciudades``), gated by ordered ``re.search`` tests on the
  state string (extractorAvaluos.py:316-544).

This tool AST-parses the reference (it never executes it -- the module
imports OCR/barcode libs that are absent here, and the reference is
untrusted) and writes ``structured_data_entity_extraction_spark/data/geo_dims.json``.
Only *data* is extracted -- alias strings and canonical names -- never code.

Run once:  python tools/extract_dims.py
"""

from __future__ import annotations

import ast
import json
import os
import sys

REFERENCE = os.environ.get("REF_PATH", "/root/reference/extractorAvaluos.py")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "structured_data_entity_extraction_spark",
    "data",
    "geo_dims.json",
)


def _find_func(tree: ast.Module, name: str) -> ast.FunctionDef:
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            return node
    raise KeyError(name)


def _assigned_literal(func: ast.FunctionDef, varname: str):
    """First literal assigned to `varname` anywhere in the function."""
    for node in ast.walk(func):
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == varname:
                    return ast.literal_eval(node.value)
    raise KeyError(varname)


def _regex_pattern_of_call(call: ast.Call) -> str:
    """Pattern string of a re.search(PAT, var, ...) call node."""
    return ast.literal_eval(call.args[0])


def _gate_exprs(test: ast.expr) -> list[dict]:
    """Flatten a branch test into [{pattern, negated}] in eval order.

    Handles the three shapes in pre_municipio: a bare re.search call,
    `a and not b` (BAJA branch), and `a or b` (CIUDAD/ESTADO branch).
    """
    if isinstance(test, ast.Call):
        return [{"pattern": _regex_pattern_of_call(test), "negated": False, "op": "and"}]
    if isinstance(test, ast.BoolOp):
        op = "and" if isinstance(test.op, ast.And) else "or"
        out = []
        for v in test.values:
            if isinstance(v, ast.UnaryOp) and isinstance(v.op, ast.Not):
                out.append({"pattern": _regex_pattern_of_call(v.operand), "negated": True, "op": op})
            else:
                out.append({"pattern": _regex_pattern_of_call(v), "negated": False, "op": op})
        return out
    raise ValueError(f"unexpected gate shape: {ast.dump(test)[:120]}")


def _municipio_branches(func: ast.FunctionDef) -> list[dict]:
    """Walk the if/elif chain; one record per branch, in source order.

    The chain is the `if re.search('AGUAS', ...)` statement inside the
    try body (preceded by a separate `if len(estado_republica) == 0`
    guard); elif branches nest in `.orelse`.
    """
    branches: list[dict] = []
    bid = 0

    def visit(node: ast.If) -> None:
        nonlocal bid
        clave = None
        patrones = None
        for stmt in node.body:
            if isinstance(stmt, ast.Assign) and isinstance(stmt.targets[0], ast.Name):
                if stmt.targets[0].id == "ciudades_clave":
                    clave = ast.literal_eval(stmt.value)
                elif stmt.targets[0].id == "patrones_ciudades":
                    patrones = ast.literal_eval(stmt.value)
        if clave is not None and patrones is not None:
            branches.append(
                {
                    "branch_id": bid,
                    "gates": _gate_exprs(node.test),
                    "ciudades_clave": clave,
                    "patrones_ciudades": patrones,
                }
            )
            bid += 1
        for child in node.orelse:
            if isinstance(child, ast.If):
                visit(child)

    for node in ast.walk(func):
        if isinstance(node, ast.If) and isinstance(node.test, (ast.Call, ast.BoolOp)):
            visit(node)
            break
    return branches


def main() -> None:
    with open(REFERENCE, encoding="utf-8") as fh:
        tree = ast.parse(fh.read())

    pre_estado = _find_func(tree, "pre_estado")
    estados_digitos = _find_func(tree, "estados_digitos")
    estado = _find_func(tree, "estado")
    pre_municipio = _find_func(tree, "pre_municipio")

    dims = {
        # extractorAvaluos.py:187-223 -- prefix -> canonical (pre-tilde-fold)
        "state_prefix_map": _assigned_literal(pre_estado, "patrones_estados"),
        # extractorAvaluos.py:233-239 -- 2-digit code -> state
        "state_code_map": _assigned_literal(estados_digitos, "estados_mexico"),
        # extractorAvaluos.py:266-271 -- ordered keyword list (incl. the
        # concatenated-literal quirk; last match wins in the reference)
        "estado_keywords": _assigned_literal(estado, "estados_clave"),
        # extractorAvaluos.py:323-541 -- 31 gated branches
        "municipio_branches": _municipio_branches(pre_municipio),
    }

    n_alias = sum(len(b["ciudades_clave"]) for b in dims["municipio_branches"])
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as fh:
        json.dump(dims, fh, ensure_ascii=False, indent=1, sort_keys=True)
    print(
        f"wrote {OUT}: {len(dims['state_prefix_map'])} state prefixes, "
        f"{len(dims['state_code_map'])} codes, {len(dims['estado_keywords'])} estado keywords, "
        f"{len(dims['municipio_branches'])} branches, {n_alias} muni aliases"
    )


if __name__ == "__main__":
    sys.exit(main())
