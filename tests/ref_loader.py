"""Load the actual reference module (`/root/reference/extractorAvaluos.py`)
for golden-oracle comparison in tests.

The reference imports OCR/barcode/HTTP libs that are absent (and
unwanted) here; all of its *text-level* functions are pure Python, so we
exec its source with stub modules injected. Test-time only; the
reference stays read-only and is never shipped. Tests that need it skip
when the path is absent.
"""

from __future__ import annotations

import os
import sys
import types

REF_PATH = os.environ.get("REF_PATH", "/root/reference/extractorAvaluos.py")

_STUB_MODULES = [
    "requests",
    "pytesseract",
    "PIL",
    "tika",
    "pyzbar",
    "pyzbar.pyzbar",
    "pdf2image",
]


def load_reference():
    """Exec the reference source with stubbed binary deps; return its
    namespace dict (functions: validez, estado, municipio, ...)."""
    if not os.path.exists(REF_PATH):
        return None
    saved = {}
    for name in _STUB_MODULES:
        saved[name] = sys.modules.get(name)
        mod = types.ModuleType(name)
        # attributes the reference touches at import time / call sites
        if name == "pytesseract":
            mod.pytesseract = types.SimpleNamespace(tesseract_cmd="")
            mod.image_to_string = lambda *a, **k: ""
        if name == "PIL":
            mod.Image = types.SimpleNamespace(open=lambda *a, **k: None)
        if name == "tika":
            mod.parser = types.SimpleNamespace()
        if name == "pyzbar.pyzbar":
            mod.decode = lambda *a, **k: []
        if name == "pdf2image":
            mod.convert_from_path = lambda *a, **k: []
        sys.modules[name] = mod
    try:
        with open(REF_PATH, encoding="utf-8") as fh:
            src = fh.read()
        ns: dict = {"__name__": "reference_extractor"}
        exec(compile(src, REF_PATH, "exec"), ns)
        return ns
    finally:
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod
