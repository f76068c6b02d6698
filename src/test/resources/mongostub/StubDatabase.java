package com.mongodb.client;

import org.bson.RawBsonDocument;
import org.bson.conversions.Bson;

@SuppressWarnings("rawtypes")
public final class StubDatabase implements MongoDatabase {
    public final String name;
    public StubDatabase(String name) { this.name = name; }

    public MongoCollection getCollection(String collectionName, Class documentClass) {
        return new StubCollection(name, collectionName);
    }

    public Object runCommand(Bson command, Class resultClass) {
        try {
            byte[] res = graft.server.MongoStubBridge.runCommand(
                name, Stubs.bytesOf(command));
            return new RawBsonDocument(res);
        } catch (graft.server.StubCommandRefused e) {
            throw new com.mongodb.MongoCommandException(e.getMessage());
        }
    }
}
