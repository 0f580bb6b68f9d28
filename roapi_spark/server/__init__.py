from roapi_spark.server.http import ApiServer, build_server

__all__ = ["ApiServer", "build_server"]
