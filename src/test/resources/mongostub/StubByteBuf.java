package org.bson;

/** Public impl class, like the driver's ByteBufNIO: the binding reflects
 * asNIO() via buf.getClass().getMethod(...), which requires the CLASS
 * (not just the interface) to be public — an anonymous impl would throw
 * IllegalAccessException, masking a real-driver-parity difference.
 */
public final class StubByteBuf implements ByteBuf {
    private final java.nio.ByteBuffer nio;
    public StubByteBuf(java.nio.ByteBuffer nio) { this.nio = nio; }
    public java.nio.ByteBuffer asNIO() { return nio; }
}
