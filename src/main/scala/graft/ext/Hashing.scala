package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashes.
  *
  * Spark's native `hash`/`xxhash64` are murmur3/xxhash with Spark-specific
  * seeds — not reproducible in DuckDB — so oracle-checked operators hash
  * through md5 hex prefixes instead: identical bytes → identical value in
  * both engines, at the cost of a slower (but still codegen'd) expression.
  * 32-bit and 60-bit variants keep downstream modular arithmetic inside
  * 64-bit signed range (no ANSI overflow).
  */
object Hashing {

  /** 32-bit positive hash: first 8 md5 hex digits as a long. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit positive hash: first 15 md5 hex digits as a long. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB mirrors (string-built SQL). */
  def h32Sql(e: String): String = s"('0x' || substr(md5($e),1,8))::BIGINT"
  def h60Sql(e: String): String = s"('0x' || substr(md5($e),1,15))::BIGINT"
}
