package org.apache.spark.sql.connect.graft

/** Test bridge into `private[connect]` service internals — only the bound
  * gRPC port, so the transport spec can dial whatever the service chose.
  */
object ConnectBridge {
  def localPort: Int =
    org.apache.spark.sql.connect.service.SparkConnectService.localPort
}
