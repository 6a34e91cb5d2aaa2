package graft.runtime

import org.slf4j.LoggerFactory

/** The reference exposes a `log` table to scripts —
  * `log.{trace,debug,info,warn,error}` backed by slf4j
  * (LuaEnvironment.scala:6-23). The Spark-first analogue: the
  * expression-path scripts don't log per row (a per-row logging
  * expression at 100 TB is an executor-melting anti-pattern — and the
  * optimizer would be entitled to elide or reorder it), so the logging
  * environment lives where arbitrary code lives: driver code and the
  * [[graft.pipeline.TypedPipeline]] closure path. Serializable, so a
  * closure can capture it; the underlying logger re-resolves per JVM. */
object Log extends Serializable {
  @transient private lazy val logger = LoggerFactory.getLogger("graft.script")

  def trace(msg: => String): Unit = if (logger.isTraceEnabled) logger.trace(msg)
  def debug(msg: => String): Unit = if (logger.isDebugEnabled) logger.debug(msg)
  def info(msg: => String): Unit = if (logger.isInfoEnabled) logger.info(msg)
  def warn(msg: => String): Unit = if (logger.isWarnEnabled) logger.warn(msg)
  def error(msg: => String): Unit = if (logger.isErrorEnabled) logger.error(msg)
}
