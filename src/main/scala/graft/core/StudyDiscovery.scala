package graft.core

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** S1: study-directory discovery (DirectoryProcessor.groovy:37-113,
  * StudyProcessor.groovy:38-74): recursively find study directories by
  * their `<Type>Data(ToUpload)` subfolder convention, skip dirs whose
  * names are wrapped in `_DONE_/_FAIL_/_DISABLED_`, derive the i2b2
  * parent path from the folder nesting between the root and the study.
  * Driver-side by design — it produces the work list that the
  * distributed pipelines consume.
  */
object StudyDiscovery {

  val DataDirRx = "^(\\w+?)Data(ToUpload)?$".r
  private val SkipRx = "^_(DONE|FAIL|DISABLED)_.*".r

  final case class StudyDir(path: Path, studyLabel: String, parentPath: String,
                            dataTypes: Map[String, Path])

  def discover(root: Path, parentNode: String = "\\Public Studies"): Seq[StudyDir] = {
    if (!Files.isDirectory(root)) return Seq.empty

    def subdirs(dir: Path): Seq[Path] =
      Files.list(dir).iterator().asScala.filter(Files.isDirectory(_)).toSeq
        .filterNot(d => SkipRx.matches(d.getFileName.toString))
        .sortBy(_.getFileName.toString)

    def dataDirsOf(dir: Path): Map[String, Path] =
      subdirs(dir).flatMap { d =>
        d.getFileName.toString match {
          case DataDirRx(tpe, _) => Some(tpe -> d)
          case _ => None
        }
      }.toMap

    // nodePath = the i2b2 path of `dir`'s CONTAINER (folders between root
    // and the study become path components; the study folder itself does not)
    def walk(dir: Path, nodePath: String): Seq[StudyDir] =
      subdirs(dir).flatMap { c =>
        val dd = dataDirsOf(c)
        if (dd.nonEmpty) Seq(StudyDir(c, c.getFileName.toString, nodePath, dd))
        else walk(c, s"$nodePath\\${c.getFileName.toString}")
      }

    walk(root, parentNode)
  }

  /** Post-processing rename: `_DONE_x` / `_FAIL_x` (StudyProcessor:76-78). */
  def markProcessed(dir: Path, success: Boolean): Path = {
    val prefix = if (success) "_DONE_" else "_FAIL_"
    val target = dir.resolveSibling(prefix + dir.getFileName.toString)
    Files.move(dir, target)
  }
}
