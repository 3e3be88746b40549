package graft.engine

import graft.SparkSuite

/** The remote-transport analog of the reference's Arrow Flight `do_get`
  * (`src/handlers/airplane.rs:126-250`: SQL in, Arrow record batches
  * out over the wire): Spark Connect. The server
  * (`SparkConnectService`) attaches to the SAME SparkContext the engine
  * runs on; a gRPC client session then executes SQL remotely and
  * receives Arrow-encoded batches — protocol, serialization format, and
  * "query service fronting the engine" role all match the reference's
  * Flight endpoint.
  *
  * This spec runs a REAL client→server round trip in-process: service
  * bound on a loopback port, a `connect.SparkSession` dialing
  * `sc://localhost:port`, SQL over parquet, Arrow results back.
  */
class ConnectTransportSpec extends SparkSuite {

  test("SQL over the Spark Connect wire matches the in-process result") {
    org.apache.spark.sql.connect.service.SparkConnectService
      .start(spark.sparkContext)
    // the service binds from the context's STATIC conf (default 15002);
    // dial whatever it actually bound
    val port = org.apache.spark.sql.connect.graft.ConnectBridge.localPort
    try {
      val remote = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port")
        .create()
      try {
        val sql = s"SELECT count(*) AS n, count(DISTINCT event_type) AS t " +
          s"FROM parquet.`$sfDir/events.parquet`"
        val viaWire = remote.sql(sql).collect()(0)
        val local = spark.sql(sql).collect()(0)
        assert(viaWire.getLong(0) == local.getLong(0))
        assert(viaWire.getLong(1) == local.getLong(1))
        assert(viaWire.getLong(0) > 0L)
      } finally remote.close()
    } finally {
      org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
    }
  }
}
