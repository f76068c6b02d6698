package com.mongodb.client;

import org.bson.conversions.Bson;

@SuppressWarnings("rawtypes")
public interface MongoCollection {
    FindIterable find(Bson filter);
    AggregateIterable aggregate(java.util.List pipeline);
    com.mongodb.bulk.BulkWriteResult bulkWrite(java.util.List requests,
            com.mongodb.client.model.BulkWriteOptions options);
}
