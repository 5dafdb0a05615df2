package graft.ingest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** File shipping (S8): the reference pushes crawler CSVs to HDFS with
  * `subprocess hdfs dfs -put -f` (historical_crawler.py:143-145,
  * hourly_updater.py:225). The engine-native equivalent uses the Hadoop
  * FileSystem API, which resolves local, HDFS, or object-store URIs from
  * the same code path — no shelling out, works wherever Spark runs.
  */
object FileShip {

  /** Copy `src` (local path) to `destDir/fileName`, overwriting like the
    * reference's `-f`. Returns the destination path.
    */
  def put(src: String, destDir: String, conf: Configuration = new Configuration()): String = {
    val srcPath = new Path("file://" + new java.io.File(src).getAbsolutePath)
    val dest = new Path(destDir, new Path(src).getName)
    val fs = dest.getFileSystem(conf)
    fs.mkdirs(new Path(destDir))
    fs.copyFromLocalFile(false /*delSrc*/, true /*overwrite*/, srcPath, dest)
    dest.toString
  }

  /** Remove a shipped file (`hdfs dfs -rm` analog, hourly_updater.py:225's
    * cleanup path).
    */
  def rm(path: String, conf: Configuration = new Configuration()): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).delete(p, false)
  }
}
