package graft.filemover

/** Filename-template grammar for post-commit file relocation.
  *
  * Re-derivation of the reference's observable semantics
  * (`MoveFilesOutputCommitter.scala:25,30,37-46`): a template is split on
  * `/`; inside each segment `$name` interpolates a partition value, where
  * `name` is alphanumeric only (`[a-zA-Z0-9]+`). Because `_` is *not*
  * part of a variable name, `cat_$category_id_$id.csv` parses as literal
  * `cat_`, var `category`, literal `_id_`, var `id`, literal `.csv`
  * (README.md:49 of the reference). Unknown variables throw
  * [[NoSuchElementException]] at render time — the reference's error
  * contract (test at MoveFilesOutputCommiterTest.scala:144-154).
  *
  * Unlike the reference (which re-applies `replaceAllIn` per file), the
  * template is parsed once into an AST and rendered per file — at 100 TB
  * a listing can hold millions of files and regex re-parsing per file is
  * measurable driver time.
  */
final case class PathTemplate(segments: Vector[Vector[PathTemplate.Part]]) {

  /** Render each `/`-segment with the given variable bindings.
    * @throws NoSuchElementException on an unbound variable, naming it. */
  def render(vars: Map[String, String]): Vector[String] =
    segments.map { parts =>
      val sb = new StringBuilder
      parts.foreach {
        case PathTemplate.Lit(s) => sb.append(s)
        case PathTemplate.Var(name) =>
          sb.append(vars.getOrElse(name,
            throw new NoSuchElementException(
              s"Key '$name' not found in partitions $vars")))
      }
      sb.toString
    }

  /** Variable names referenced anywhere in the template. */
  def variables: Set[String] =
    segments.flatten.collect { case PathTemplate.Var(n) => n }.toSet
}

object PathTemplate {
  sealed trait Part
  final case class Lit(s: String) extends Part
  final case class Var(name: String) extends Part

  private val VarRef = "\\$([a-zA-Z0-9]+)".r

  def parse(template: String): PathTemplate = {
    // default split (limit 0) drops TRAILING empty segments, exactly like
    // the reference's `moveFiles.split("/")` (M:25) — a "$outputDirectory/"
    // template is therefore "$outputDirectory", not a render ending in an
    // empty segment (which new Path(parent, "") would reject mid-commit)
    val segments = template.split("/").toVector.map { seg =>
      val parts = Vector.newBuilder[Part]
      var last = 0
      for (m <- VarRef.findAllMatchIn(seg)) {
        if (m.start > last) parts += Lit(seg.substring(last, m.start))
        parts += Var(m.group(1))
        last = m.end
      }
      if (last < seg.length) parts += Lit(seg.substring(last))
      parts.result()
    }
    PathTemplate(segments)
  }
}
