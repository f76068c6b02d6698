package com.mongodb.client;

public interface MongoIterable {
    MongoCursor iterator();
}
