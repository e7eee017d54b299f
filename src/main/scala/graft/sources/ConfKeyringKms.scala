package graft.sources

import java.util.Base64

import org.apache.parquet.crypto.KeyAccessDeniedException
import org.apache.parquet.crypto.keytools.LocalWrapKmsClient

/** Configuration-keyring KMS client for Parquet MODULAR ENCRYPTION (the
  * at-rest columnar-encryption machinery parquet-mr ships and Spark
  * activates through `parquet.crypto.factory.class`): master keys live in
  * the Hadoop conf as `parquet.encryption.key.list = id:base64[, ...]` —
  * the same convention as parquet's own test-only InMemoryKMS, which is
  * not bundled in the runtime jar. LOCAL wrapping (the
  * [[LocalWrapKmsClient]] base) means data keys are wrapped/unwrapped
  * in-process with AES-GCM against the master key and the KMS is never
  * called per file — the deployment mode for an HSM-backed master key at
  * 100 TB, where a per-file KMS round trip would melt the key server.
  * A production deployment swaps this class for its real KMS client via
  * the same one-line conf; nothing else changes. */
class ConfKeyringKms extends LocalWrapKmsClient {

  override protected def initializeInternal(): Unit = ()

  override protected def getMasterKeyFromServer(id: String): Array[Byte] = {
    val list = Option(hadoopConfiguration.get("parquet.encryption.key.list"))
      .getOrElse(throw new KeyAccessDeniedException("parquet.encryption.key.list not set"))
    list.split(',').map(_.trim).collectFirst {
      case e if e.startsWith(id + ":") =>
        Base64.getDecoder.decode(e.substring(id.length + 1).trim)
    }.getOrElse(throw new KeyAccessDeniedException(s"unknown master key: $id"))
  }
}
