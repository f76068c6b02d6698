package com.mongodb.client.model;

import org.bson.conversions.Bson;

public final class UpdateManyModel extends WriteModel {
    public final Bson filter;
    public final Bson update;
    public final UpdateOptions options;
    public UpdateManyModel(Bson filter, Bson update, UpdateOptions options) {
        this.filter = filter;
        this.update = update;
        this.options = options;
    }
}
