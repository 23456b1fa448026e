package graft.multimodal

/** Poison-pill wrapper for the codec family — the sibling of
  * DocParse.parseAnySafe (r12 verdict #3) for media blobs: every
  * codec in `multimodal/` is deliberately LOUD on malformed input
  * (the oracle fixtures want hard failure on drift), but a 100 TB
  * curation job must not lose a task to one corrupt JPEG. attempt()
  * turns any NonFatal decode failure into a typed row the job keeps
  * as data; fatal JVM errors still propagate. The reference swallows
  * these silently (pipelines.py:18-20, transform_data.py:593-599) —
  * this is the same tolerance with the failure kept visible. */
object SafeDecode {

  final case class DecodeFailure(format: String, error: String)

  def attempt[T](format: String)(f: => T): Either[DecodeFailure, T] =
    try Right(f)
    catch {
      case scala.util.control.NonFatal(e) =>
        val msg = Option(e.getMessage).getOrElse("")
          .replace('\n', ' ').take(200)
        Left(DecodeFailure(format, s"${e.getClass.getSimpleName}: $msg"))
    }
}
