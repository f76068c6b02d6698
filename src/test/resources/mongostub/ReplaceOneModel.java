package com.mongodb.client.model;

import org.bson.conversions.Bson;

/** Real 4.x ctor erasure: (Bson filter, T replacement, ReplaceOptions). */
public final class ReplaceOneModel extends WriteModel {
    public final Bson filter;
    public final Object replacement;
    public final ReplaceOptions options;
    public ReplaceOneModel(Bson filter, Object replacement, ReplaceOptions options) {
        this.filter = filter;
        this.replacement = replacement;
        this.options = options;
    }
}
