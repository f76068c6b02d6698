package com.mongodb.client;

import org.bson.conversions.Bson;

@SuppressWarnings({"rawtypes", "unchecked"})
public final class StubCollection implements MongoCollection {
    public final String db, coll;
    public StubCollection(String db, String coll) { this.db = db; this.coll = coll; }

    public FindIterable find(Bson filter) {
        return new StubFindIterable(db, coll, Stubs.bytesOf(filter));
    }

    public AggregateIterable aggregate(java.util.List pipeline) {
        final java.util.List<byte[]> stages = new java.util.ArrayList<byte[]>();
        for (Object s : pipeline) stages.add(Stubs.bytesOf((Bson) s));
        return new AggregateIterable() {
            public AggregateIterable allowDiskUse(Boolean allowDiskUse) {
                graft.server.MongoStubBridge.noteAllowDiskUse(allowDiskUse);
                return this;
            }
            public MongoCursor iterator() {
                return Stubs.cursorOf(
                    graft.server.MongoStubBridge.aggregate(db, coll, stages));
            }
        };
    }

    public com.mongodb.bulk.BulkWriteResult bulkWrite(java.util.List requests,
            com.mongodb.client.model.BulkWriteOptions options) {
        java.util.List<Object[]> ops = new java.util.ArrayList<Object[]>();
        for (Object m : requests) {
            if (m instanceof com.mongodb.client.model.InsertOneModel) {
                com.mongodb.client.model.InsertOneModel im =
                    (com.mongodb.client.model.InsertOneModel) m;
                ops.add(new Object[] {"insert", null,
                    Stubs.bytesOfDoc(im.document), Boolean.FALSE, Boolean.FALSE});
            } else if (m instanceof com.mongodb.client.model.ReplaceOneModel) {
                com.mongodb.client.model.ReplaceOneModel rm =
                    (com.mongodb.client.model.ReplaceOneModel) m;
                ops.add(new Object[] {"replace", Stubs.bytesOf(rm.filter),
                    Stubs.bytesOfDoc(rm.replacement),
                    Boolean.valueOf(rm.options.isUpsert), Boolean.FALSE});
            } else if (m instanceof com.mongodb.client.model.UpdateOneModel) {
                com.mongodb.client.model.UpdateOneModel um =
                    (com.mongodb.client.model.UpdateOneModel) m;
                ops.add(new Object[] {"update", Stubs.bytesOf(um.filter),
                    Stubs.bytesOf(um.update),
                    Boolean.valueOf(um.options.isUpsert), Boolean.FALSE});
            } else if (m instanceof com.mongodb.client.model.UpdateManyModel) {
                com.mongodb.client.model.UpdateManyModel um =
                    (com.mongodb.client.model.UpdateManyModel) m;
                ops.add(new Object[] {"update", Stubs.bytesOf(um.filter),
                    Stubs.bytesOf(um.update),
                    Boolean.valueOf(um.options.isUpsert), Boolean.TRUE});
            } else {
                throw new IllegalArgumentException("stub: unknown model " + m);
            }
        }
        try {
            long[] c = graft.server.MongoStubBridge.bulkWrite(
                db, coll, ops, options.isOrdered);
            return new com.mongodb.bulk.BulkWriteResult(
                (int) c[0], (int) c[1], (int) c[2], upsertsList((int) c[3]));
        } catch (graft.server.StubBulkErrors e) {
            long[] c = e.counts();
            java.util.List<com.mongodb.bulk.BulkWriteError> errs =
                new java.util.ArrayList<com.mongodb.bulk.BulkWriteError>();
            for (String msg : e.messages())
                errs.add(new com.mongodb.bulk.BulkWriteError(msg));
            throw new com.mongodb.MongoBulkWriteException(
                new com.mongodb.bulk.BulkWriteResult(
                    (int) c[0], (int) c[1], (int) c[2], upsertsList((int) c[3])),
                errs);
        }
    }

    private static java.util.List<Object> upsertsList(int n) {
        java.util.List<Object> l = new java.util.ArrayList<Object>();
        for (int i = 0; i < n; i++) l.add(new Object());
        return l;
    }
}
