"""Serialized JSON request/response façade over EditSession (W1-W9).

The reference exposes the schema-editing session as HTTP routes over a
global Conv (/root/reference/web/routes.go:23-54, web/web.go); this
module is the equivalent *serialized* surface: ``WebApi.handle(method,
path, query, body)`` takes JSON-decodable payloads and returns
``(status, payload)`` with the same route names, request shapes
(web.go's updateCol/updateTable:301-318, rename maps:539-560, index
lists:658-699) and response shapes (per-table summary map:204-219,
conversion-rate color map:1066-1089). An external client can
round-trip every §2.6 operation as pure JSON text; plugging this into
any HTTP server is a five-line adapter.

Error mapping mirrors the reference's HTTP codes: guard violations
(SessionError) -> 400, unknown routes -> 404. Mutating routes return
the updated conversion state like web.go's
``json.NewEncoder(w).Encode(sessionState.conv)``; failed edits roll
the session back (web/web.go:785-795).
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

from .report import analyze_tables, generate_summary
from .session import EditSession, PreconditionError, SessionError

_NAME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9_]*$")


class WebApi:
    def __init__(self, session: EditSession):
        self.session = session

    # -- dispatch -----------------------------------------------------------
    def handle(self, method: str, path: str,
               query: Optional[dict] = None,
               body: Any = None) -> tuple[int, Any]:
        """Route table of web/routes.go:23-54 (dump/infoschema
        connection routes are the CLI's job here; session routes only).
        ``body`` may be a JSON string or an already-decoded value."""
        query = query or {}
        if isinstance(body, str):
            try:
                body = json.loads(body)
            except json.JSONDecodeError as e:
                return 400, f"Request Body parse error : {e}"
        routes = {
            ("GET", "/ddl"): self._get_ddl,
            ("GET", "/session"): self._create_session,
            ("POST", "/session/resume"): self._resume_session,
            ("GET", "/summary"): self._get_summary,
            ("GET", "/overview"): self._get_overview,
            ("GET", "/conversion"): self._get_conversion_rate,
            ("GET", "/typemap"): self._get_typemap,
            ("POST", "/typemap/global"): self._set_typemap_global,
            ("POST", "/typemap/table"): self._update_table_schema,
            ("GET", "/setparent"): self._set_parent,
            ("GET", "/drop/fk"): self._drop_fk,
            ("GET", "/drop/secondaryindex"): self._drop_index,
            ("POST", "/rename/fks"): self._rename_fks,
            ("POST", "/rename/indexes"): self._rename_indexes,
            ("POST", "/add/indexes"): self._add_indexes,
        }
        fn = routes.get((method.upper(), path))
        if fn is None:
            return 404, f"no route {method} {path}"
        # structurally malformed payloads (missing keys, wrong types)
        # must map to 400 like the reference's http.StatusBadRequest on
        # decode failure, not escape as raw exceptions; restore the
        # pre-request state so a mid-edit failure can't leave partial
        # changes (web/web.go:785-795 rollback semantics)
        pre = self.session.ctx.to_json()
        try:
            return fn(query, body)
        except PreconditionError as e:
            # the reference's http.StatusPreconditionFailed class:
            # index/FK dependencies that must be removed first
            return 412, str(e)
        except SessionError as e:
            return 400, str(e)
        except (KeyError, TypeError, AttributeError, ValueError) as e:
            from .context import MigrationContext
            self.session.ctx = MigrationContext.from_json(pre)
            return 400, (f"malformed request payload: "
                         f"{type(e).__name__}: {e}")

    # -- read routes --------------------------------------------------------
    def _get_ddl(self, query, body):
        return 200, self.session.ddl()

    def _create_session(self, query, body):
        """web/session.go createSession: dump the session state."""
        return 200, {"conv": json.loads(self.session.snapshot())}

    def _resume_session(self, query, body):
        from .context import MigrationContext
        if not isinstance(body, dict) or "conv" not in body:
            return 400, "expected {conv: <session state>}"
        conv = body["conv"]
        # from_json is deliberately lenient (forward-compatible session
        # files), so shape-check here: a resume payload without the
        # core schema maps is not a session state
        if not isinstance(conv, dict) \
                or not {"src_schema", "sp_schema", "to_target"} <= set(conv):
            return 400, ("malformed request payload: conv is not a "
                         "session state (src_schema/sp_schema/to_target "
                         "required)")
        self.session.ctx = MigrationContext.from_json(json.dumps(conv))
        return 200, "OK"

    def _get_summary(self, query, body):
        """web/web.go:204-219: per-source-table issue summary."""
        out = {}
        for tr in analyze_tables(self.session.ctx):
            parts = []
            for b in tr.body:
                parts.append(b.heading + "\n")
                for i, line in enumerate(b.lines):
                    parts.append(f"{i + 1}) {line}.\n\n")
            out[tr.src_table] = "".join(parts)
        return 200, out

    def _get_overview(self, query, body):
        ctx = self.session.ctx
        return 200, generate_summary(ctx, analyze_tables(ctx))

    def _get_conversion_rate(self, query, body):
        return 200, self.session.conversion_rate_color()

    def _get_typemap(self, query, body):
        return 200, self.session.typemap()

    # -- mutating routes (snapshot + rollback on failure) -------------------
    def _conv_payload(self) -> dict:
        return {"conv": json.loads(self.session.ctx.to_json())}

    def _set_typemap_global(self, query, body):
        """web/web.go:266-300: body is {srcType: targetType}."""
        if not isinstance(body, dict):
            return 400, "expected {srcType: targetType}"
        self.session.snapshot()
        try:
            for src_type, target in body.items():
                self.session.set_type_map_global(src_type, target)
        except SessionError as e:
            self.session.rollback()
            return (412 if isinstance(e, PreconditionError) else 400,
                    str(e))
        return 200, self._conv_payload()

    def _update_table_schema(self, query, body):
        """web/web.go:327-390: ?table=T, body updateTable."""
        table = query.get("table", "")
        if not table:
            return 400, "Table name is empty"
        cols = (body or {}).get("UpdateCols", {})
        self.session.snapshot()
        s = self.session
        try:
            for col, spec in cols.items():
                if spec.get("Removed"):
                    s.remove_column(table, col)
                    continue
                to_type = spec.get("ToType", "")
                if to_type:
                    s.change_column_type(table, col, to_type)
                nn = spec.get("NotNull", "")
                if nn == "ADDED":
                    s.set_not_null(table, col, True)
                elif nn == "REMOVED":
                    s.set_not_null(table, col, False)
                rename = spec.get("Rename", "")
                if rename and rename != col:
                    s.rename_column(table, col, rename)
        except SessionError as e:
            self.session.rollback()
            return (412 if isinstance(e, PreconditionError) else 400,
                    str(e))
        return 200, self._conv_payload()

    def _set_parent(self, query, body):
        table = query.get("table", "")
        if not table:
            return 400, "Table name is empty"
        update = str(query.get("update", "true")).lower() != "false"
        st = self.session.set_parent_table(table, update=update)
        resp = {"tableInterleaveStatus": {
            "Possible": st.possible, "Parent": st.parent,
            "Comment": st.comment}}
        if update and st.possible:
            resp["sessionState"] = self._conv_payload()
        return 200, resp

    def _drop_fk(self, query, body):
        """web/web.go:509-534: ?table=T&pos=i (positional, matching the
        reference's TODO-by-position API)."""
        table, pos = query.get("table", ""), query.get("pos", "")
        if not table or pos == "":
            return 400, "Table name or position is empty"
        t = self.session._table(table)
        try:
            position = int(pos)
        except ValueError:
            return 400, "Error converting position to integer"
        if position < 0 or position >= len(t.fks):
            return 400, f"No foreign key found at position {position}"
        t.fks = t.fks[:position] + t.fks[position + 1:]
        return 200, self._conv_payload()

    def _drop_index(self, query, body):
        table, pos = query.get("table", ""), query.get("pos", "")
        if not table or pos == "":
            return 400, "Table name or position is empty"
        t = self.session._table(table)
        try:
            position = int(pos)
        except ValueError:
            return 400, "Error converting position to integer"
        if position < 0 or position >= len(t.indexes):
            return 400, f"No secondary index found at position {position}"
        t.indexes = t.indexes[:position] + t.indexes[position + 1:]
        return 200, self._conv_payload()

    def _validate_new_names(self, names: list) -> Optional[str]:
        """web/web.go:702-743: spanner-validity + shared-namespace."""
        lower = {n.lower() for n in names}
        if len(lower) != len(names):
            return f"Found duplicate names in input : {','.join(names)}"
        bad = [n for n in names if not _NAME_RE.match(n)]
        if bad:
            return ("Following names are not valid Spanner identifiers: "
                    + ",".join(bad))
        return None

    def _rename_fks(self, query, body):
        table = query.get("table", "")
        if not isinstance(body, dict):
            return 400, "expected {oldName: newName}"
        err = self._validate_new_names(list(body.values()))
        if err:
            return 400, err
        self.session.snapshot()
        try:
            for old, new in body.items():
                self.session.rename_foreign_key(table, old, new)
        except SessionError as e:
            self.session.rollback()
            return (412 if isinstance(e, PreconditionError) else 400,
                    str(e))
        return 200, self._conv_payload()

    def _rename_indexes(self, query, body):
        table = query.get("table", "")
        if not isinstance(body, dict):
            return 400, "expected {oldName: newName}"
        err = self._validate_new_names(list(body.values()))
        if err:
            return 400, err
        self.session.snapshot()
        try:
            for old, new in body.items():
                self.session.rename_index(table, old, new)
        except SessionError as e:
            self.session.rollback()
            return (412 if isinstance(e, PreconditionError) else 400,
                    str(e))
        return 200, self._conv_payload()

    def _add_indexes(self, query, body):
        """web/web.go:658-699: body = [{Name, Table, Unique, Keys:
        [{Col, Desc}]}] (ddl.CreateIndex shape)."""
        table = query.get("table", "")
        if not isinstance(body, list):
            return 400, "expected a list of indexes"
        err = self._validate_new_names([ix.get("Name", "") for ix in body])
        if err:
            return 400, err
        self.session.snapshot()
        try:
            for ix in body:
                keys = [(k["Col"], bool(k.get("Desc", False)))
                        for k in ix.get("Keys", [])]
                self.session.add_index(table, ix.get("Name", ""),
                                       bool(ix.get("Unique", False)), keys)
        except SessionError as e:
            self.session.rollback()
            return (412 if isinstance(e, PreconditionError) else 400,
                    str(e))
        return 200, self._conv_payload()
