"""Server entrypoint: ``python -m roapi_spark -c config.yml`` (reference:
roapi binary, roapi/src/main.rs + startup.rs) or ad-hoc tables via
``-t name=uri`` (CLI shorthand, columnq/src/table/mod.rs:860-923)."""

from __future__ import annotations

import argparse
import signal
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser("roapi_spark")
    ap.add_argument("-c", "--config", help="YAML config file")
    ap.add_argument("-t", "--table", action="append", default=[], help="name=uri[,opt=val]")
    ap.add_argument("-a", "--addr", default=None, help="host:port (default from config)")
    ap.add_argument("-d", "--disable-read-only", action="store_true")
    ap.add_argument("--tls-cert", default=None, help="PEM cert chain: serve HTTPS with ALPN h2/http1.1")
    ap.add_argument("--tls-key", default=None, help="PEM private key for --tls-cert")
    ap.add_argument("--http-token", default=None, help="bearer token required on the HTTP API (health stays open)")
    ap.add_argument("--statement-timeout", type=float, default=None,
                    help="seconds before a query is cancelled (408); default unlimited")
    ap.add_argument(
        "--http-basic",
        action="append",
        default=[],
        metavar="USER:PASS",
        help="basic-auth credential for the HTTP API (repeatable)",
    )
    ap.add_argument("--pg-addr", default=None, help="host:port for the postgres-wire endpoint")
    ap.add_argument("--mysql-addr", default=None, help="host:port for the mysql-wire endpoint")
    ap.add_argument(
        "--mysql-user",
        action="append",
        default=[],
        metavar="USER:PASS",
        help="mysql-wire credential (repeatable; default spark with empty password)",
    )
    ap.add_argument("--flight-addr", default=None, help="host:port for the Arrow Flight endpoint")
    ap.add_argument("--flight-token", default=None, help="bearer token for the Flight endpoint")
    ap.add_argument(
        "--flight-basic",
        action="append",
        default=[],
        metavar="USER:PASS",
        help="basic-auth credential for the Flight endpoint (repeatable)",
    )
    args = ap.parse_args(argv)

    from roapi_spark.catalog import catalog_from_config
    from roapi_spark.config import AppConfig, load_config_file, parse_table_uri_arg
    from roapi_spark.server import ApiServer
    from roapi_spark.session import get_spark

    cfg = load_config_file(args.config) if args.config else AppConfig()
    for t in args.table:
        cfg.tables.append(parse_table_uri_arg(t))
    if args.disable_read_only:
        cfg.read_only = False
    if args.addr:
        cfg.addr = args.addr

    spark = get_spark("roapi_spark_server", extra_conf=cfg.spark_conf)
    cat = catalog_from_config(spark, cfg)
    http_basic = dict(c.partition(":")[::2] for c in args.http_basic)
    server = ApiServer(
        cat,
        default_format=cfg.default_response_format,
        auth_token=args.http_token,
        basic_auth=http_basic or None,
        statement_timeout_s=args.statement_timeout,
    )
    host, _, port = cfg.addr.partition(":")
    bound_host, bound_port = server.start(
        host or "127.0.0.1", int(port or 8080),
        certfile=args.tls_cert, keyfile=args.tls_key,
    )
    scheme = "https" if args.tls_cert else "http"
    print(f"roapi_spark listening on {scheme}://{bound_host}:{bound_port}", flush=True)

    # optional wire protocols, served alongside HTTP (startup.rs:140-177)
    pg_server = mysql_server = flight_server = None
    if args.pg_addr:
        from roapi_spark.server.postgres import PostgresServer

        h, _, p = args.pg_addr.partition(":")
        pg_server = PostgresServer(cat, h or "127.0.0.1", int(p or 5432))
        pg_server.start()
        print(f"postgres wire on {h or '127.0.0.1'}:{pg_server.port}", flush=True)
    if args.mysql_addr:
        from roapi_spark.server.mysql import MySqlServer

        h, _, p = args.mysql_addr.partition(":")
        users = dict(c.partition(":")[::2] for c in args.mysql_user)
        mysql_server = MySqlServer(
            cat, h or "127.0.0.1", int(p or 3306), users=users or None
        )
        mysql_server.start()
        print(f"mysql wire on {h or '127.0.0.1'}:{mysql_server.port}", flush=True)
    if args.flight_addr:
        from roapi_spark.server.flight import SparkFlightServer

        h, _, p = args.flight_addr.partition(":")
        basic = dict(c.partition(":")[::2] for c in args.flight_basic)
        flight_server = SparkFlightServer(
            cat,
            f"grpc://{h or '127.0.0.1'}:{p or 50051}",
            token=args.flight_token,
            basic_auth=basic or None,
        )
        print(f"arrow flight on grpc://{h or '127.0.0.1'}:{flight_server.port}", flush=True)

    stop = signal.sigwait([signal.SIGINT, signal.SIGTERM])
    print(f"signal {stop}; shutting down", flush=True)
    server.stop()
    if pg_server:
        pg_server.stop()
    if mysql_server:
        mysql_server.stop()
    if flight_server:
        flight_server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
