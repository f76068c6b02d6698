package com.mongodb.client;

import org.bson.conversions.Bson;

/** Raw types mirror the 4.x generic erasures the binding's getMethod
 * lookups assume: getCollection(String, Class) and
 * runCommand(Bson, Class) returning Object.
 */
@SuppressWarnings("rawtypes")
public interface MongoDatabase {
    MongoCollection getCollection(String collectionName, Class documentClass);
    Object runCommand(Bson command, Class resultClass);
}
