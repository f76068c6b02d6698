package com.mongodb.client;

import org.bson.conversions.Bson;

/** The seven fluent cursor options the binding drives, with the real
 * (Bson) / (int) parameter erasures.
 */
public interface FindIterable extends MongoIterable {
    FindIterable sort(Bson sort);
    FindIterable projection(Bson projection);
    FindIterable min(Bson min);
    FindIterable max(Bson max);
    FindIterable hint(Bson hint);
    FindIterable skip(int skip);
    FindIterable limit(int limit);
}
