package graft.core

/** Error hierarchy mirroring the reference's exception taxonomy.
  *
  * Reference: cryoflow wraps every plugin/config failure in a typed
  * exception carried inside a `Result` monad and halts the pipeline at
  * the first `Failure` (/root/reference/packages/cryoflow-core/
  * cryoflow_core/pipeline.py:33-58, result.py:12-41). We use
  * `Either[Throwable, *]` — the idiomatic Scala railway — with the same
  * staged error messages.
  */
sealed abstract class GraftError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Config loading failed (any of the four stages: exists / read /
  * parse / validate — config.py:102-126). */
final class ConfigLoadError(msg: String, cause: Throwable = null)
    extends GraftError(msg, cause)

/** Plugin discovery / instantiation failed (loader.py:96-121). */
final class PluginLoadError(msg: String, cause: Throwable = null)
    extends GraftError(msg, cause)

/** A plugin's execute() failed at pipeline time. */
final class PluginExecutionError(msg: String, cause: Throwable = null)
    extends GraftError(msg, cause)

/** A plugin's dry_run() schema validation failed. */
final class SchemaValidationError(msg: String, cause: Throwable = null)
    extends GraftError(msg, cause)

object Errors {

  /** `bind_safe` combinator (reference result.py:12-41): run `f`
    * catching non-fatal throwables; failures become
    * `errCls(s"$msg: $e")`. Returns an Either-producing function
    * suitable for flatMap chains.
    */
  def bindSafe[A, B](f: A => B, wrap: (String, Throwable) => Throwable,
                     msg: String): A => Either[Throwable, B] = { a =>
    try Right(f(a))
    catch {
      case scala.util.control.NonFatal(e) =>
        Left(wrap(s"$msg: ${e.getMessage}", e))
    }
  }

  /** Catch non-fatal exceptions into Left (the `@safe` decorator). */
  def safe[T](body: => T): Either[Throwable, T] =
    try Right(body)
    catch { case scala.util.control.NonFatal(e) => Left(e) }
}
