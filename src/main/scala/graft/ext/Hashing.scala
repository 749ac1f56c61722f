package graft.ext

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

import graft.expr.Md5Prefix64

/** Engine-portable deterministic hashes.
  *
  * Spark's native `hash`/`xxhash64` are murmur3/xxhash with Spark-specific
  * seeds — not reproducible in DuckDB — so oracle-checked operators hash
  * through md5 hex prefixes instead: identical bytes → identical value in
  * both engines. Implemented by the custom codegen'd [[Md5Prefix64]]
  * expression (value-identical to `conv(substring(md5(c),1,n),16,10)` but
  * without the per-row hex-string round trip). 32-bit and 60-bit variants
  * keep downstream modular arithmetic inside 64-bit signed range (no ANSI
  * overflow).
  */
object Hashing {

  private def md5Prefix(c: Column, digits: Int): Column =
    GraftColumnBridge.column(Md5Prefix64(GraftColumnBridge.expression(c), digits))

  /** 32-bit positive hash: first 8 md5 hex digits as a long. */
  def h32(c: Column): Column = md5Prefix(c.cast("string"), 8)

  /** 60-bit positive hash: first 15 md5 hex digits as a long. */
  def h60(c: Column): Column = md5Prefix(c.cast("string"), 15)

  /** DuckDB mirrors (string-built SQL). */
  def h32Sql(e: String): String = s"('0x' || substr(md5($e),1,8))::BIGINT"
  def h60Sql(e: String): String = s"('0x' || substr(md5($e),1,15))::BIGINT"
}
