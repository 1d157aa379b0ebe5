package graft.sources

import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Test-only accessor: builds a bare row scan for a path so specs can
  * drive the `SupportsRuntimeFiltering` surface directly (the classes
  * are private[sources]). */
class QuirkCsvScanBuilderAccess {
  def scanFor(path: String): QuirkCsvScan = {
    val opts = new CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("path", path))
    val ds = new QuirkCsvDataSource()
    val schema = ds.inferSchema(opts)
    new QuirkCsvScanBuilder(schema, opts).build()
      .asInstanceOf[QuirkCsvScan]
  }
}
