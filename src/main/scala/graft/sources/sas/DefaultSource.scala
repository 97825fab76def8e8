package graft.sources.sas

import java.io.RandomAccessFile

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, RelationProvider, TableScan}
import org.apache.spark.sql.types.StructType

/** Spark face of the built-in [[Sas7bdat]] reader:
  * `spark.read.format("graft.sources.sas").load(path)`.
  *
  * Scan shape: metadata parses ONCE on the driver (header + meta
  * pages); the scan distributes PAGE INDEX RANGES, and each task seeks
  * directly to its pages and decodes rows there — uncompressed sas7bdat
  * pages are fixed-size and independently decodable, which makes the
  * format splittable the same way the third-party readers split it.
  * The path must be task-readable (shared filesystem — the same
  * contract every file source has). */
final class DefaultSource extends RelationProvider {
  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("path is required"))
    new SasRelation(ctx, path)
  }
}

final class SasRelation(ctx: SQLContext, path: String)
    extends BaseRelation with TableScan with Serializable {

  private val meta = Sas7bdat.readMeta(path)

  override val sqlContext: SQLContext = ctx
  override val schema: StructType = meta.schema

  override def buildScan(): RDD[Row] = {
    val m = meta
    val p = path
    val sc = ctx.sparkSession.sparkContext
    val slices = math.max(1, math.min(m.pageCount, sc.defaultParallelism))
    sc.parallelize(0 until m.pageCount, slices).mapPartitions { pages =>
      val in = new RandomAccessFile(p, "r")
      // an early-terminating scan (limit/take) never exhausts the
      // iterator, so the close-on-exhaust below would leak one handle
      // per task — the completion listener closes it no matter how the
      // task ends (close() is idempotent)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          try in.close() catch { case _: Throwable => () }
        })
      val buf = new Array[Byte](m.pageSize)
      val it = pages.flatMap { pg =>
        in.seek(m.headerSize.toLong + pg.toLong * m.pageSize)
        in.readFully(buf)
        Sas7bdat.pageRows(buf, m)
      }
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) in.close()
          h
        }
        override def next(): Row = it.next()
      }
    }
  }
}
