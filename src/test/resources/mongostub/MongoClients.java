package com.mongodb.client;

public final class MongoClients {
    private MongoClients() {}
    public static MongoClient create(String connectionString) {
        return new StubMongoClient(connectionString);
    }
}
