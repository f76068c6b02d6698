package com.mongodb.client;

import org.bson.RawBsonDocument;
import org.bson.conversions.Bson;

final class Stubs {
    private Stubs() {}

    static byte[] bytesOf(Bson b) {
        if (b == null) return null;
        return ((RawBsonDocument) b).stubBytes();
    }

    static byte[] bytesOfDoc(Object doc) {
        return ((RawBsonDocument) doc).stubBytes();
    }

    /** Wrap a list of encoded docs as a cursor of RawBsonDocument. */
    static MongoCursor cursorOf(java.util.List<byte[]> docs) {
        final java.util.Iterator<byte[]> it = docs.iterator();
        return new MongoCursor() {
            public boolean hasNext() { return it.hasNext(); }
            public Object next() { return new RawBsonDocument(it.next()); }
            public void close() {}
        };
    }
}
