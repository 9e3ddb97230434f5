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

  /** Post-processing rename: `_DONE_x` / `_FAIL_x` (StudyProcessor:76-78).
    * Also the zip marking (`_DONE_Study.zip`, ZipStudyProcessor:28-34). */
  def markProcessed(dir: Path, success: Boolean): Path = {
    val prefix = if (success) "_DONE_" else "_FAIL_"
    val target = dir.resolveSibling(prefix + dir.getFileName.toString)
    Files.move(dir, target)
  }

  /** Zip studies in `dir` (DirectoryProcessor.groovy:59): `X.zip` holds a
    * single study folder `X/`. Skips already-marked archives. */
  def zipStudies(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".zip"))
      .filterNot(p => p.getFileName.toString.startsWith("_"))
      .toSeq.sortBy(_.getFileName.toString)

  /** Extract a zip study for processing. The reference reads entries
    * in-place through a zip FileSystem (ZipStudyProcessor.groovy:23-26);
    * Spark's distributed readers need real file paths, so the archive is
    * extracted to `scratch` and normal discovery continues there. Returns
    * the extracted study dir (named like the archive minus `.zip`). */
  def extractZipStudy(zip: Path, scratch: Path): Path = {
    val name = zip.getFileName.toString.stripSuffix(".zip")
    val zf = new java.util.zip.ZipFile(zip.toFile)
    try {
      zf.entries().asScala.foreach { e =>
        val out = scratch.resolve(e.getName).normalize()
        require(out.startsWith(scratch), s"zip entry escapes scratch: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(out)
        else {
          Files.createDirectories(out.getParent)
          val in = zf.getInputStream(e)
          try Files.copy(in, out,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
      }
    } finally zf.close()
    scratch.resolve(name)
  }
}
