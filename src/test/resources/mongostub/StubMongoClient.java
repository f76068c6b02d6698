package com.mongodb.client;

/** Transport impls: every call crosses to the parent-classloader bridge
 * (graft.server.MongoStubBridge) as plain bytes/ints/booleans, and the
 * bridge delegates to a graft.server.FakeServerClient — so the binding's
 * reflection surface runs end-to-end against the engine's own store
 * semantics. Documents cross as RawBsonDocument bytes, exactly the
 * real-driver wire shape the binding assumes.
 */
public final class StubMongoClient implements MongoClient {
    public final String uri;
    public StubMongoClient(String uri) { this.uri = uri; }
    public MongoDatabase getDatabase(String name) { return new StubDatabase(name); }
    public void close() { graft.server.MongoStubBridge.clientClosed(); }
}
