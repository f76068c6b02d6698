package com.mongodb.client.model;

import org.bson.conversions.Bson;

public final class UpdateOneModel extends WriteModel {
    public final Bson filter;
    public final Bson update;
    public final UpdateOptions options;
    public UpdateOneModel(Bson filter, Bson update, UpdateOptions options) {
        this.filter = filter;
        this.update = update;
        this.options = options;
    }
}
