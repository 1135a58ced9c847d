package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared load-partition directory listing: decode Spark's partition-path
  * escaping and keep only timestamp-shaped values (a null load lands in
  * `key=__HIVE_DEFAULT_PARTITION__`, whose '_' would otherwise sort above
  * every digit). Used by the latest-load read ([[TableEtl]]) and load
  * retention ([[graft.ext.Retention]]).
  */
object LoadPartitions {

  /** Inverse of Spark's partition-path escaping (%XX, uppercase hex). */
  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length)
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** (directory, decoded value) for every `key=<timestamp>` child of
    * `root`, decoded values ordered lexically = chronologically.
    */
  def timestampDirs(fs: FileSystem, root: Path, key: String)
      : Seq[(Path, String)] = {
    if (!fs.exists(root)) Seq.empty
    else {
      val prefix = key + "="
      fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
        .map(s => (s.getPath, unescape(s.getPath.getName.drop(prefix.length))))
        .filter { case (_, v) => v.matches("""\d{4}-\d{2}-\d{2}.*""") }
        .sortBy(_._2)
    }
  }
}
