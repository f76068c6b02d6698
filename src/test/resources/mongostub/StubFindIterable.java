package com.mongodb.client;

import org.bson.conversions.Bson;

public final class StubFindIterable implements FindIterable {
    private final String db, coll;
    private final byte[] filter;
    private byte[] minB, maxB, hintB, sortB, projB;
    private int skipN = 0, limitN = -1;

    public StubFindIterable(String db, String coll, byte[] filter) {
        this.db = db; this.coll = coll; this.filter = filter;
    }

    public FindIterable sort(Bson s) { this.sortB = Stubs.bytesOf(s); return this; }
    public FindIterable projection(Bson p) { this.projB = Stubs.bytesOf(p); return this; }
    public FindIterable min(Bson m) { this.minB = Stubs.bytesOf(m); return this; }
    public FindIterable max(Bson m) { this.maxB = Stubs.bytesOf(m); return this; }
    public FindIterable hint(Bson h) { this.hintB = Stubs.bytesOf(h); return this; }
    public FindIterable skip(int n) { this.skipN = n; return this; }
    public FindIterable limit(int n) { this.limitN = n; return this; }

    public MongoCursor iterator() {
        return Stubs.cursorOf(graft.server.MongoStubBridge.find(
            db, coll, filter, minB, maxB, hintB, sortB, projB, skipN, limitN));
    }
}
