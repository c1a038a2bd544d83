"""Golden request/response tests for the serialized W-layer
(web_api.WebApi), matching the reference's route table
(web/routes.go:23-54) and payload shapes (web/web.go)."""

import json

import pytest

from harbourbridge_spark import types as tt
from harbourbridge_spark.session import EditSession
from harbourbridge_spark.web_api import WebApi

from test_session import _singers_ctx


@pytest.fixture
def api():
    return WebApi(EditSession(_singers_ctx(), "postgres"))


def test_get_ddl(api):
    status, payload = api.handle("GET", "/ddl")
    assert status == 200
    assert "CREATE TABLE singers" in payload["singers"]
    assert "PRIMARY KEY" in payload["singers"]


def test_get_typemap_and_conversion(api):
    status, tm = api.handle("GET", "/typemap")
    assert status == 200
    assert tt.STRING in tm["int8"]
    status, colors = api.handle("GET", "/conversion")
    assert status == 200
    assert set(colors) == {"singers", "albums", "loose"}
    assert all(c in ("GREEN", "BLUE", "YELLOW", "ORANGE")
               for c in colors.values())


def test_summary_and_overview(api):
    status, summary = api.handle("GET", "/summary")
    assert status == 200 and "loose" in summary
    status, overview = api.handle("GET", "/overview")
    assert status == 200 and overview.startswith("Schema conversion:")


def test_typemap_global_roundtrip(api):
    # body as JSON text, exactly what an HTTP client would post
    status, resp = api.handle("POST", "/typemap/global",
                              body=json.dumps({"int4": tt.STRING}))
    assert status == 200
    col = api.session.ctx.sp_schema["singers"].col_defs["score"]
    assert col.type == tt.Type(tt.STRING)
    assert "conv" in resp  # mutating routes return the session state
    # illegal mapping -> 400, state rolled back
    status, msg = api.handle("POST", "/typemap/global",
                             body={"int8": tt.BYTES})
    assert status == 400


def test_update_table_schema_payload(api):
    body = {"UpdateCols": {
        "name": {"Removed": False, "Rename": "full_name", "PK": "",
                 "NotNull": "ADDED", "ToType": ""},
    }}
    status, resp = api.handle("POST", "/typemap/table",
                              query={"table": "singers"}, body=body)
    assert status == 200
    t = api.session.ctx.sp_schema["singers"]
    assert "full_name" in t.col_defs and "name" not in t.col_defs
    assert t.col_defs["full_name"].not_null


def test_update_table_schema_guard_rolls_back(api):
    body = {"UpdateCols": {
        "singerid": {"Removed": True, "Rename": "", "PK": "",
                     "NotNull": "", "ToType": ""},
    }}
    status, msg = api.handle("POST", "/typemap/table",
                             query={"table": "singers"}, body=body)
    assert status == 400 and "primary key" in msg
    assert "singerid" in api.session.ctx.sp_schema["singers"].col_defs


def test_setparent_and_drop_fk(api):
    status, resp = api.handle("GET", "/setparent",
                              query={"table": "albums"})
    assert status == 200
    assert resp["tableInterleaveStatus"]["Possible"] is True
    assert resp["tableInterleaveStatus"]["Parent"] == "singers"

    # FK was consumed by the interleave; dropping position 0 now 400s
    status, msg = api.handle("GET", "/drop/fk",
                             query={"table": "albums", "pos": "0"})
    assert status == 400


def test_drop_fk_positional(api):
    status, resp = api.handle("GET", "/drop/fk",
                              query={"table": "albums", "pos": "0"})
    assert status == 200
    assert api.session.ctx.sp_schema["albums"].fks == []


def test_add_rename_drop_indexes(api):
    body = [{"Name": "idx_name", "Table": "singers", "Unique": False,
             "Keys": [{"Col": "name", "Desc": False}]}]
    status, resp = api.handle("POST", "/add/indexes",
                              query={"table": "singers"}, body=body)
    assert status == 200
    assert api.session.ctx.sp_schema["singers"].indexes[0].name == "idx_name"

    status, _ = api.handle("POST", "/rename/indexes",
                           query={"table": "singers"},
                           body={"idx_name": "idx_renamed"})
    assert status == 200
    assert api.session.ctx.sp_schema["singers"].indexes[0].name == \
        "idx_renamed"

    # invalid identifier rejected with the reference's message shape
    status, msg = api.handle("POST", "/rename/indexes",
                             query={"table": "singers"},
                             body={"idx_renamed": "9bad name"})
    assert status == 400 and "not valid Spanner identifiers" in msg

    status, _ = api.handle("GET", "/drop/secondaryindex",
                           query={"table": "singers", "pos": "0"})
    assert status == 200
    assert api.session.ctx.sp_schema["singers"].indexes == []


def test_session_create_resume_roundtrip(api):
    status, dump = api.handle("GET", "/session")
    assert status == 200 and "conv" in dump
    # mutate, then resume from the dump -> mutation undone
    api.handle("POST", "/typemap/global", body={"int4": tt.STRING})
    assert api.session.ctx.sp_schema["singers"].col_defs["score"].type == \
        tt.Type(tt.STRING)
    status, _ = api.handle("POST", "/session/resume",
                           body=json.dumps(dump))
    assert status == 200
    assert api.session.ctx.sp_schema["singers"].col_defs["score"].type == \
        tt.Type(tt.INT64)


def test_unknown_route_404(api):
    status, _ = api.handle("GET", "/nope")
    assert status == 404


def test_payloads_json_serializable(api):
    """Every response must be pure JSON text round-trippable — the
    whole point of the serialized façade."""
    for method, path, query, body in [
        ("GET", "/ddl", None, None),
        ("GET", "/typemap", None, None),
        ("GET", "/conversion", None, None),
        ("GET", "/summary", None, None),
        ("GET", "/overview", None, None),
        ("GET", "/session", None, None),
        ("GET", "/setparent", {"table": "albums"}, None),
    ]:
        status, payload = api.handle(method, path, query, body)
        assert status == 200
        json.dumps(payload)  # must not raise


def test_malformed_payloads_map_to_400_not_500(api):
    """Structurally malformed decoded payloads (missing keys, wrong
    types) must return 400 like the reference's StatusBadRequest, and
    must not leave partial edits behind."""
    before = api.session.ctx.to_json()
    # /add/indexes key entry missing 'Col' -> KeyError path
    status, msg = api.handle("POST", "/add/indexes",
                             {"table": "singers"},
                             [{"Name": "idx_x", "Keys": [{"Desc": True}]}])
    assert status == 400 and "malformed" in msg
    # /typemap/table UpdateCols spec that is not an object
    status, msg = api.handle("POST", "/typemap/table",
                             {"table": "singers"},
                             {"UpdateCols": {"score": "not-an-object"}})
    assert status == 400
    # /session/resume conv missing required fields
    status, msg = api.handle("POST", "/session/resume",
                             body={"conv": {"bogus": 1}})
    assert status == 400
    assert api.session.ctx.to_json() == before


def test_http_transport_real_sockets(api):
    """The stdlib server surface: the same routes over urllib against a
    live socket (reference serves web/routes.go over net/http)."""
    import urllib.error
    import urllib.request

    from harbourbridge_spark.web_server import serve

    server = serve(api)
    try:
        base = "http://127.0.0.1:%d" % server.server_address[1]

        def get(path):
            with urllib.request.urlopen(base + path, timeout=10) as r:
                return r.status, json.loads(r.read().decode())

        def post(path, payload):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
                method="POST")
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status, json.loads(r.read().decode())

        status, ddl = get("/ddl")
        assert status == 200 and "CREATE TABLE singers" in ddl["singers"]

        status, sess = get("/session")
        assert status == 200 and "conv" in sess

        status, resp = post("/typemap/table?table=singers",
                            {"UpdateCols": {"score": {"ToType": tt.STRING}}})
        assert status == 200
        assert api.session.ctx.sp_schema["singers"].col_defs["score"] \
            .type == tt.Type(tt.STRING)

        # error statuses surface as real HTTP errors
        with pytest.raises(urllib.error.HTTPError) as ei:
            get("/no/such/route")
        assert ei.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/typemap/global", {"int8": tt.BYTES})
        assert ei.value.code == 400
        # body-level JSON parse error -> 400 (reference decode failure)
        req = urllib.request.Request(
            base + "/typemap/global", data=b"{not json",
            headers={"Content-Type": "application/json"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 400
    finally:
        server.shutdown()
