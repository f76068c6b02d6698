package com.mongodb.client;

/** Like the driver's: the cursor IS a java.util.Iterator — the binding
 * casts iterator() results to Iterator and streams.
 */
@SuppressWarnings("rawtypes")
public interface MongoCursor extends java.util.Iterator, java.io.Closeable {
    void close();
}
