"""F12 golden tests: markdown mapping-table parse
(reference parity: agents/ontology_synthesizer.py:101-151)."""

from case_uco_ontology_map_spark.refmap.markdown import (
    parse_mapping_rows,
    parse_property_mappings,
)

REPORT = """# Ontology research report

Some prose before the table.

| PROPERTY | STATUS | NOTES | MAPS TO |
|---|---|---|---|
| observable:fileName | ok | the name | record["filename"] |
| observable:sizeInBytes | ok | bytes | record.size |
| observable:hash | ok | none mapped | (none) |
| observable:mimeType | ok | blank | |
| observable:weird | ok | no ref | just text |
| core:tag | ok | quoted | use record['labels'] here |

Prose after ends the table.
| observable:ignored | x | y | record["nope"] |

| PROPERTY | A | B | MAPS TO |
|---|---|---|---|
| observable:fileName | dup | second table | record.alt_name |
short row follows (dropped):
| observable:short | only three |
"""

MAP = {
    "properties": {
        "FileFacet": ["observable:fileName", "observable:sizeInBytes"],
        "ContentDataFacet": ["observable:fileName"],
        "UcoObject": ["core:tag"],
    }
}


def test_parse_mapping_rows_ordered_and_filtered():
    assert parse_mapping_rows(REPORT) == [
        ("observable:fileName", "filename"),
        ("observable:sizeInBytes", "size"),
        ("core:tag", "labels"),
        ("observable:fileName", "alt_name"),
    ]


def test_property_field_map_inverse_ownership():
    out = parse_property_mappings(REPORT, MAP)
    assert out == {
        "FileFacet": {
            "observable:fileName": ["filename", "alt_name"],
            "observable:sizeInBytes": ["size"],
        },
        "ContentDataFacet": {"observable:fileName": ["filename", "alt_name"]},
        "UcoObject": {"core:tag": ["labels"]},
    }


def test_empty_inputs():
    assert parse_property_mappings("", MAP) == {}
    assert parse_property_mappings(REPORT, {"properties": {}}) == {}
    assert parse_mapping_rows(None) == []


def test_reference_parity_on_fixture():
    """Run the reference's own parser on the same fixture when importable —
    byte-identical output required (skip if its deps are absent)."""
    import importlib.util
    import sys

    import pytest

    spec = importlib.util.spec_from_file_location(
        "_ref_synth", "/root/reference/agents/ontology_synthesizer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        sys.modules["_ref_synth"] = mod
        spec.loader.exec_module(mod)
    except Exception as e:  # reference has LLM-stack imports we don't ship
        pytest.skip(f"reference module not importable here: {e}")
    finally:
        sys.modules.pop("_ref_synth", None)
    assert mod._parse_property_mappings(REPORT, MAP) == parse_property_mappings(
        REPORT, MAP
    )
