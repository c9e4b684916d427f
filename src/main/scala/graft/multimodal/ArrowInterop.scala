package graft.multimodal

import java.io.ByteArrayInputStream
import java.nio.channels.Channels

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, IntVector, VarBinaryVector, VarCharVector, VectorLoader, VectorSchemaRoot, VectorUnloader}
import org.apache.arrow.vector.ipc.{ReadChannel, WriteChannel}
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Arrow-batched transform surface: the JVM half of the
  * `mapInPandas`/`mapInArrow` interop contract.
  *
  * Python worker processes cannot run in this container, but the part
  * of that pipeline that belongs to the ENGINE is all here and real:
  * each partition's rows are serialized into Arrow record batches of a
  * bounded size (the memory knob when payloads are MBs), handed to a
  * batch-level function as raw IPC bytes — the exact wire format a
  * vectorized Python worker consumes — and the returned batches are
  * deserialized back into a DataFrame. Swapping [[digestWorker]] for a
  * socket to a Python process changes nothing upstream or downstream of
  * the byte iterator.
  *
  * Uses the same `private[sql]` ArrowConverters Spark's own Python
  * runners are built on (via GraftSqlBridge), so batch framing is
  * byte-compatible with PySpark's.
  */
object ArrowInterop {

  /** `mapInArrow`-shaped transform: `f` maps serialized Arrow record
    * batches to serialized Arrow record batches, per partition.
    * `batchSize` bounds rows per batch (peak decoded memory per task).
    * `f` must be serializable — it executes inside the task. */
  def mapInArrowBatches(df: DataFrame, outSchema: StructType,
      batchSize: Int)(f: Iterator[Array[Byte]] => Iterator[Array[Byte]]): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val tz = spark.conf.get("spark.sql.session.timeZone")
    val rdd = GraftSqlBridge.internalRows(df).mapPartitions { it =>
      GraftSqlBridge.fromArrowBatches(
        f(GraftSqlBridge.toArrowBatches(it, inSchema, batchSize, tz)),
        outSchema, tz)
    }
    GraftSqlBridge.fromInternalRows(spark, rdd, outSchema)
  }

  /** Output schema of [[digestWorker]]. */
  val DigestSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", IntegerType),
    StructField("digest", StringType)))

  /** A real Arrow worker (in-JVM stand-in for the Python process): for
    * each input batch of (doc_id BIGINT, payload VARBINARY) it parses
    * the IPC bytes with the Arrow vector library, computes
    * (doc_id, byte_len, sha256-hex) COLUMNARLY, and re-serializes an
    * output batch — one batch in, one batch out, bounded memory. */
  def digestWorker(inSchema: StructType, tz: String)(
      batches: Iterator[Array[Byte]]): Iterator[Array[Byte]] = {
    val inArrow = GraftSqlBridge.arrowSchema(inSchema, tz)
    val outArrow = GraftSqlBridge.arrowSchema(DigestSchema, tz)
    batches.map { bytes =>
      val allocator = new RootAllocator()
      try {
        val rootIn = VectorSchemaRoot.create(inArrow, allocator)
        val rootOut = VectorSchemaRoot.create(outArrow, allocator)
        try {
          val rb = MessageSerializer.deserializeRecordBatch(
            new ReadChannel(Channels.newChannel(new ByteArrayInputStream(bytes))),
            allocator)
          try new VectorLoader(rootIn).load(rb) finally rb.close()

          val ids = rootIn.getVector("doc_id").asInstanceOf[BigIntVector]
          val payloads = rootIn.getVector("payload").asInstanceOf[VarBinaryVector]
          val outIds = rootOut.getVector("doc_id").asInstanceOf[BigIntVector]
          val outLens = rootOut.getVector("byte_len").asInstanceOf[IntVector]
          val outDigests = rootOut.getVector("digest").asInstanceOf[VarCharVector]
          val n = rootIn.getRowCount
          rootOut.allocateNew()
          var i = 0
          while (i < n) {
            // a null PAYLOAD nulls only the derived columns — the row's
            // identity survives (nulling doc_id too moved the row under
            // the output's doc_id sort and shifted every later row
            // against the oracle; adversarial-harness finding)
            if (ids.isNull(i)) outIds.setNull(i)
            else outIds.setSafe(i, ids.get(i))
            if (payloads.isNull(i)) {
              outLens.setNull(i); outDigests.setNull(i)
            } else {
              val payload = payloads.get(i)
              outLens.setSafe(i, payload.length)
              outDigests.setSafe(i,
                Multimodal.Codecs.sha256Hex(payload).getBytes("UTF-8"))
            }
            i += 1
          }
          rootOut.setRowCount(n)

          val outBatch = new VectorUnloader(rootOut).getRecordBatch
          try {
            val baos = new java.io.ByteArrayOutputStream()
            MessageSerializer.serialize(
              new WriteChannel(Channels.newChannel(baos)), outBatch)
            baos.toByteArray
          } finally outBatch.close()
        } finally { rootIn.close(); rootOut.close() }
      } finally allocator.close()
    }
  }
}
