"""Golden parity: our pure-Python kernels (refsem) vs the ACTUAL
reference functions (exec'd from /root/reference) on the seeded fixture
corpus plus hand-picked edge snippets. This is the per-function layer of
SURVEY.md §5 item 1."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from structured_data_entity_extraction_spark import refsem
from structured_data_entity_extraction_spark.fixtures import avaluo_docs
from tests.ref_loader import load_reference

REF = load_reference()

pytestmark = pytest.mark.skipif(REF is None, reason="reference repo not present")

FIELD_FNS = [
    "validez",
    "opcion_de_firma",
    "estado",
    "municipio",
    "legibilidad",
    "colonia",
    "calle",
    "fecha",
]

EDGE_SNIPPETS = [
    "",
    "texto sin anclas de ningun tipo",
    # window clipping at text start/end
    "avalúo",
    "x avaluo",
    "VALOR CONCLUIDO $1",
    # estado: last-match-wins (two ENTIDAD FED windows)
    "ENTIDAD FEDERATIVA JALISCO mas texto ENTIDAD FEDERATIVA SONORA",
    # estado: digit fallback (no keyword match)
    "ENTIDAD FED 14 sin nombre de estado",
    # the concatenated-keyword quirk: bare 'ESTADO DE ME' never matches
    "ENTIDAD FEDERATIVA ESTADO DE MEXICO",
    "ENTIDAD FEDERATIVA ESTADO DE MÉXICO",
    # municipio vote tie -> first-listed alias
    "ENTIDAD FEDERATIVA AGUASCALIENTES Municipio CALVILLO y Municipio ASIENTOS",
    # accent-variant alias
    "ENTIDAD FEDERATIVA AGUASCALIENTES Municipio COSÍO",
    "ENTIDAD FEDERATIVA AGUASCALIENTES MUNICIPIO COSIO",
    # colonia stop patterns + noise cleaning
    "Colonia LAS FLORES CP 12345",
    "Colonia CENTRO NOMBRE algo",
    "Colonia SIN STOP PATTERN AQUI",
    # calle
    "domicilio AV REFORMA 12, TIPO DE VIALIDAD calle",
    "y número CALLE FALSA 123 COLONIA CENTRO",
    # fecha numeric + prose + zero-pad
    "fecha del avalúo 5/3/2021",
    "fecha del avalúo 12 de marzo de 2021",
    "fecha 2021",
    # money: . vs , last-separator, no separator, Geo skip, 33-N truncation
    "VALOR CONCLUIDO $1,234,567.89",
    "VALOR CONCLUIDO $780.000,25",
    "VALOR CONCLUIDO $4500000",
    "VALOR CONCLUIDO Geo $1.00 y VALOR CONCLUIDO $2.50",
    "VALOR CONCLUIDO $100.00 33 N notas",
    # whitespace normalization interplay with len(texto) clipping
    "fecha   del   avalúo    05/03/2021",
]


def _corpus():
    texts = [r["text"] for r in avaluo_docs(120, seed=42)]
    return texts + EDGE_SNIPPETS


@pytest.mark.parametrize("fn", FIELD_FNS)
def test_field_parity(fn):
    ours = getattr(refsem, fn)
    theirs = REF[fn]
    mismatches = []
    for t in _corpus():
        a, b = ours(t), theirs(t)
        if a != b:
            mismatches.append((t[:120], a, b))
    assert not mismatches, f"{fn}: {len(mismatches)} mismatches, first: {mismatches[:3]}"


def test_valor_parity():
    mismatches = []
    for t in _corpus():
        a = refsem.valor(t)
        b = REF["valor"](t)
        if tuple(a) != tuple(b):
            mismatches.append((t[:120], a, b))
    assert not mismatches, f"valor: {mismatches[:3]}"


@pytest.mark.parametrize(
    "fn,samples",
    [
        ("quitar_tildes", ["ÁÉÍÓÚ áé", "JUÁREZ"]),
        ("pre_estado", ["AGUASCA", "[NIA SUR]", "QUERÉ", "NOPE", "ciudad de mé"]),
        ("estados_digitos", ["cp 14 x", "codigo 99", "123 07", "nada"]),
        ("eliminar_33", ["abc 33 N x 33 N y", "abc 33,- z", "abc"]),
        (
            "extract_characters",
            ["$1,234.56", "$1.234,56", "$999", "sin simbolo", "$1,2,3.4.5"],
        ),
        ("pre_fecha", ["5/3/2021", "05-03-2021", "12 de marzo de 2021", "nada"]),
        ("second_pre_fecha", ["12 de marzo de 2021", "marzo 2021", "12 marzo", "2021"]),
        ("pre_colonia", ["LAS FLORES CP 1", "X NOMBRE y", "SIN STOPS"]),
        ("pre_calle", ["AV X TIPO DE VIALIDAD", "CALLE Y NOMBRE", "SIN STOPS AQUI"]),
        ("second_match_colonia", ["A NOMBRE B", "A 21 B", "limpio"]),
        ("second_match_calle", ["A UBICADA B", "A SUBD B", "limpio"]),
    ],
)
def test_scalar_parity(fn, samples):
    ours = getattr(refsem, fn if fn != "quitar_tildes" else "fold_tildes")
    theirs = REF[fn]
    for s in samples:
        assert ours(s) == theirs(s), (fn, s, ours(s), theirs(s))


def test_pre_municipio_parity():
    cases = [
        ("Municipio CALVILLO", "AGUASCALIENTES"),
        ("MUNICIPIO TIJUANA", "BAJA CALIFORNIA"),
        ("Municipio LA PAZ", "BAJA CALIFORNIA SUR"),
        ("Municipio TLALPAN", "CIUDAD DE MEXICO"),
        ("Municipio TOLUCA", "ESTADO DE MEXICO"),
        ("Municipio JUÁREZ", "CHIHUAHUA"),
        ("Municipio GUADALAJARA", "JALISCO"),
        ("Municipio OAXACA DE JUÁREZ", "OAXACA"),
        ("Municipio MERIDA", "YUCATAN"),
        ("Municipio X", ""),
        ("", "SONORA"),
    ]
    for parrafo, st in cases:
        assert refsem.pre_municipio(parrafo, st) == REF["pre_municipio"](parrafo, st), (
            parrafo,
            st,
        )


def test_record_parity_modulo_barcode():
    """Full 13-field record vs reference field functions (barcode fields
    are fixed ''/NO: binary acquisition out of scope, SURVEY §2.1)."""
    for t in _corpus()[:60]:
        rec = refsem.extract_record(t)
        assert rec["validez_del_formato"] == REF["validez"](t)
        assert rec["estado"] == REF["estado"](t)
        assert rec["municipio"] == REF["municipio"](t)
        assert rec["legibilidad"] == REF["legibilidad"](t)
        assert rec["avaluo"] == REF["valor"](t)[0]
