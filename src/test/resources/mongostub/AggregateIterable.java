package com.mongodb.client;

public interface AggregateIterable extends MongoIterable {
    AggregateIterable allowDiskUse(Boolean allowDiskUse);
}
