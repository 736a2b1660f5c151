"""parse_json_column + nested-document validation over a JSON-string col."""

import pyarrow as pa
import pytest

import ray.data as rd

from jschon_ray.functions.text import parse_json_column


def test_parse_json_column_shapes():
    t = pa.table({
        "id": [1, 2, 3, 4, 5],
        "props": ['{"k": 4}', '{"k": 99, "m": "x"}', None, "{}",
                  '{"k": -3}'],
    })
    out = parse_json_column(t, "props")
    assert pa.types.is_struct(out.schema.field("props").type)
    vals = out["props"].to_pylist()
    assert vals[0]["k"] == 4
    assert vals[1] == {"k": 99, "m": "x"}
    assert vals[2] is None                       # null row stays null
    assert vals[3]["k"] is None                  # {} -> absent field
    assert vals[4]["k"] == -3


def test_parse_json_column_empty_batch():
    t = pa.table({"props": pa.array([], pa.string())})
    out = parse_json_column(t, "props")
    assert out.num_rows == 0


def test_nested_validation_matches_row_semantics(ray_session):
    """Struct-column nested spec: presence=non-null, required, bounds."""
    from jschon_ray.pipelines.validate import validate_dataset

    spec = {
        "type": "object",
        "required": ["props"],
        "properties": {
            "props": {
                "type": "object",
                "required": ["k"],
                "properties": {"k": {"type": "integer", "minimum": 0,
                                     "maximum": 50}},
            },
        },
    }
    t = pa.table({
        "id": [0, 1, 2, 3, 4],
        "props": ['{"k": 10}',     # valid
                  '{"k": 51}',     # maximum fails
                  '{"k": -1}',     # minimum fails
                  "{}",            # required k fails
                  None],           # required props fails
    })
    ds = rd.from_arrow(t).map_batches(
        lambda b: parse_json_column(b, "props"), batch_format="pyarrow")
    df = validate_dataset(ds, spec).to_pandas().sort_values("id")
    assert df["valid"].tolist() == [True, False, False, False, False]


def test_props_query_parity_sf0001(ray_session):
    import duckdb

    from jschon_ray.pipelines.queries import build_oracles, build_queries

    sf = "/root/testdata/sf0.001"
    df = build_queries()["validate_events_props"](sf).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    odf = con.execute(build_oracles()["validate_events_props"]).df() \
        .sort_values("event_id").reset_index(drop=True)
    assert len(df) == len(odf) > 0
    assert df["valid"].astype(bool).tolist() == \
        odf["valid"].astype(bool).tolist()
