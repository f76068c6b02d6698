package org.bson;

/** Stub of org.bson.ByteBuf — only the accessor the binding reflects. */
public interface ByteBuf {
    java.nio.ByteBuffer asNIO();
}
