package graft.etl

/** C2/C3 — engine configuration mirroring the reference CLI surface
  * (config/ConverterConfig.java:28-191). Validation reproduces the
  * `validate()` invariant table at config/ConverterConfig.java:170-191.
  *
  * The zip-bomb guards (C3, HighVolumeExcelConverter.java:82) become plain
  * numeric source-option validation here: parquet input cannot zip-bomb, but
  * the limits remain part of the public config contract.
  */
final case class EngineConfig(
    inputDir: String,
    sheetName: Option[String] = None,
    sheetIndex: Int = 0,
    headerRow: Int = 0,
    outputPath: Option[String] = None,
    format: String = "ndjson", // ndjson | csv | json
    batchSize: Int = 50000,
    overwrite: Boolean = false,
    continueOnError: Boolean = false,
    memoryThresholdMb: Int = 512,
    minInflateRatio: Double = 0.01,
    maxEntrySizeBytes: Long = 6L * 1024 * 1024 * 1024,
    prettyJson: Boolean = false) {

  /** config/ConverterConfig.java:170-191 invariants. */
  def validate(): EngineConfig = {
    require(batchSize > 0, s"batchSize must be > 0, got $batchSize")
    require(memoryThresholdMb > 0, s"memoryThreshold must be > 0, got $memoryThresholdMb")
    require(minInflateRatio >= 0, s"minInflateRatio must be >= 0, got $minInflateRatio")
    require(sheetIndex >= 0, s"sheetIndex must be >= 0, got $sheetIndex")
    require(headerRow >= 0, s"headerRow must be >= 0, got $headerRow")
    require(maxEntrySizeBytes > 0, s"maxEntrySize must be > 0, got $maxEntrySizeBytes")
    val fmt = format.toLowerCase
    require(Set("ndjson", "csv", "json").contains(fmt), s"unknown format '$format'")
    // outputPath required unless CSV (which derives chunk names from input;
    // config/ConverterConfig.java:34-35,106-109)
    require(fmt == "csv" || outputPath.isDefined,
      s"outputPath is required for format '$format'")
    this
  }
}
