package graft.filemover

import org.apache.hadoop.fs.Path

/** Pure rename-plan construction (FM4–FM7 of SURVEY.md §2.A) — fully
  * unit-testable without a filesystem.
  *
  * Semantics re-derived from the reference (`MoveFilesOutputCommitter
  * .scala:29-51`):
  *  - partition values are recovered by walking a file's path elements
  *    root→leaf — INCLUDING the file's own name, exactly like the
  *    reference (`Seq.iterate(f, f.depth())` starts at the file, M:32) —
  *    and matching the *whole* element name against
  *    `(\w+)=([a-zA-Z0-9 -_]*)` — note the value class contains
  *    the range 0x20–0x5F, so spaces/dashes/underscores and Hive's
  *    `__HIVE_DEFAULT_PARTITION__` placeholder are all legal values;
  *    deeper elements win on key collision (a `k=v`-shaped file NAME
  *    therefore overrides a same-key ancestor directory, on both
  *    implementations);
  *  - the synthetic variable `outputDirectory` is always bound to the
  *    job output path (overriding any same-named partition column);
  *  - collision gate: if any two source files render to the same target,
  *    NO file is moved at all (global all-or-nothing, locked by the
  *    reference tests at MoveFilesOutputCommiterTest.scala:60-74).
  */
object RenamePlanner {

  private val PartitionDir = "(\\w+)=([a-zA-Z0-9 -_]*)".r

  /** Partition key/values encoded in `file`'s ancestor directory names,
    * deeper directories overriding shallower ones. */
  def partitionsOf(file: Path): Map[String, String] = {
    val dirs = Iterator.iterate(file)(_.getParent)
      .takeWhile(_ != null).toVector.reverse
    dirs.foldLeft(Map.empty[String, String]) { (acc, p) =>
      p.getName match {
        case PartitionDir(k, v) => acc + (k -> v)
        case _ => acc
      }
    }
  }

  /** Target path for one file: fold the rendered segments onto `root`
    * (the filesystem-resolved `/`), as the reference does — an absolute
    * `$outputDirectory`-prefixed first segment therefore resolves to an
    * absolute path. */
  def targetFor(file: Path, template: PathTemplate, root: Path,
      outputPath: Path): Path = {
    val vars = partitionsOf(file) + ("outputDirectory" -> outputPath.toString)
    template.render(vars).foldLeft(root)((p, seg) => new Path(p, seg))
  }

  /** Build the full rename plan; returns Nil if the collision gate
    * trips (any target with >1 sources ⇒ move nothing). */
  def plan(files: Seq[Path], template: PathTemplate, root: Path,
      outputPath: Path): Seq[(Path, Path)] = {
    val renames = files.map(f => f -> targetFor(f, template, root, outputPath))
    val collided = renames.groupBy(_._2).exists(_._2.size > 1)
    if (collided) Nil else renames
  }
}
