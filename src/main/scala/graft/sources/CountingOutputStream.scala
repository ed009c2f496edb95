package graft.sources

/** OutputStream wrapper counting written bytes in a LONG.
  * `java.io.DataOutputStream.size()` saturates at Int.MaxValue, which
  * would silently corrupt every recorded offset (Index.db positions,
  * Summary.db offsets, `previousUnfilteredSize` deltas) past a 2 GiB
  * file — and the write path is spill-bounded precisely so files that
  * size can stream through it. Write-through (no buffering of its own),
  * so a flush/close anywhere below sees every byte. */
final class CountingOutputStream(under: java.io.OutputStream)
    extends java.io.OutputStream {
  var count: Long = 0L
  override def write(b: Int): Unit = { under.write(b); count += 1 }
  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    under.write(b, off, len); count += len
  }
  override def flush(): Unit = under.flush()
  override def close(): Unit = under.close()
}
