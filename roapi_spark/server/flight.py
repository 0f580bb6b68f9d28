"""Arrow Flight server — the FlightSQL-parity surface (reference:
roapi/src/server/flight_sql.rs, 1038 LoC).

Protocol mapping (same lifecycle as the reference):
- ``get_flight_info`` with a command descriptor (the SQL string) executes
  the query eagerly and stashes the Arrow result under a UUID ticket —
  mirroring flight_sql.rs:318-373's eager exec + DashMap results cache;
  the returned FlightInfo carries schema + ticket + row count.
- ``do_get`` streams the stashed batches for a ticket (one-shot, popped on
  read — flight_sql.rs:279-316 do_get_fallback).
- ``list_flights`` enumerates registered tables with schemas (the
  catalog/table metadata surface, flight_sql.rs:614-704).
- ``do_action``: ``list-tables`` and ``table-schema`` actions.
- Optional bearer-token auth via a header middleware with constant-time
  compare (flight_sql.rs:164-187, M9).
"""

from __future__ import annotations

import hmac
import json
import threading
import uuid

import pyarrow as pa
import pyarrow.flight as flight

from roapi_spark.catalog import Catalog


class _BearerAuthMiddlewareFactory(flight.ServerMiddlewareFactory):
    def __init__(self, token: str) -> None:
        self._token = token

    def start_call(self, info, headers):
        auths = headers.get("authorization") or headers.get("Authorization") or []
        for a in auths:
            if a.lower().startswith("bearer ") and hmac.compare_digest(
                a[7:], self._token
            ):
                return None
        raise flight.FlightUnauthenticatedError("invalid or missing bearer token")


class SparkFlightServer(flight.FlightServerBase):
    def __init__(
        self,
        catalog: Catalog,
        location: str = "grpc://127.0.0.1:0",
        token: str | None = None,
    ) -> None:
        middleware = {"auth": _BearerAuthMiddlewareFactory(token)} if token else None
        super().__init__(location, middleware=middleware)
        self.catalog = catalog
        self._results: dict[bytes, pa.Table] = {}
        self._lock = threading.Lock()

    # -- query path --------------------------------------------------------

    def get_flight_info(self, context, descriptor):
        if descriptor.descriptor_type != flight.DescriptorType.CMD:
            raise flight.FlightServerError("expected a command (SQL) descriptor")
        sql = descriptor.command.decode("utf-8")
        table = self.catalog.query_sql(sql).toArrow()
        ticket = uuid.uuid4().hex.encode()
        with self._lock:
            self._results[ticket] = table
        endpoint = flight.FlightEndpoint(ticket, [])
        return flight.FlightInfo(
            table.schema, descriptor, [endpoint], table.num_rows, table.nbytes
        )

    def do_get(self, context, ticket):
        with self._lock:
            table = self._results.pop(ticket.ticket, None)
        if table is None:
            raise flight.FlightServerError("unknown or already-consumed ticket")
        return flight.RecordBatchStream(table)

    # -- metadata ----------------------------------------------------------

    def list_flights(self, context, criteria):
        for name in self.catalog.table_names():
            schema = self.catalog.table(name).schema
            arrow_schema = self.catalog.table(name).limit(0).toArrow().schema
            descriptor = flight.FlightDescriptor.for_path(name)
            yield flight.FlightInfo(arrow_schema, descriptor, [], -1, -1)
            del schema

    def do_action(self, context, action):
        if action.type == "list-tables":
            yield json.dumps(self.catalog.table_names()).encode()
        elif action.type == "table-schema":
            name = action.body.to_pybytes().decode()
            yield json.dumps(self.catalog.schema(name)).encode()
        else:
            raise flight.FlightServerError(f"unknown action: {action.type}")

    def list_actions(self, context):
        return [("list-tables", "list registered tables"), ("table-schema", "schema for a table")]
