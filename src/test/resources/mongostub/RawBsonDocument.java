package org.bson;

/** Stub of org.bson.RawBsonDocument: opaque BSON bytes. Pins the two
 * members the binding uses — the (byte[]) constructor and
 * getByteBuffer() — with the real 4.x signatures.
 */
public final class RawBsonDocument implements org.bson.conversions.Bson {
    private final byte[] bytes;

    public RawBsonDocument(byte[] bytes) {
        this.bytes = bytes.clone();
    }

    public ByteBuf getByteBuffer() {
        return new StubByteBuf(java.nio.ByteBuffer.wrap(bytes.clone()));
    }

    /** Stub-internal accessor (not part of the driver API; only the stub
     * transport classes call it — the binding never does). */
    public byte[] stubBytes() { return bytes.clone(); }
}
